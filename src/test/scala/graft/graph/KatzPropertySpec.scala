package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the exact-integer Katz recurrence:
  * ScalaCheck-random directed multigraphs against an in-memory replay of
  * x₀ = S, x_{k+1}(v) = S + (Σ_{u→v} x_k(u)) div A. The engine's
  * deterministic contract is precisely this floored-BIGINT chain
  * (Algos.katz scaladoc), so the oracle demands EXACT equality — any
  * drift in the edge⋈state join (dropped parallel edge, double-counted
  * self loop, a vertex missing from the state frame) breaks it. Parallel
  * edges matter here: each edge ROW contributes its source's mass, so the
  * generator keeps duplicates. */
class KatzPropertySpec extends SparkSpec {
  import spark.implicits._

  private def katzRef(edges: Seq[(Long, Long)], rounds: Int,
                      attenDiv: Long, scale: Long): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var x = verts.map(_ -> scale).toMap
    for (_ <- 1 to rounds) {
      val sums = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => x(e._1)).sum
      }
      x = verts.map(v => v -> (scale + sums.getOrElse(v, 0L) / attenDiv)).toMap
    }
    x
  }

  test("katz equals the in-memory integer recurrence on random digraphs") {
    val gen = for {
      n <- Gen.choose(3, 30)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      // small divisor → large, structure-revealing path masses; the
      // engine contract is well-defined whatever A is
      val rows = Algos.katz(edges.toDF("src", "dst"), rounds = 4, attenDiv = 8L)
        .as[(Long, Long)].collect()
      val got = rows.toMap
      val want = katzRef(edges, rounds = 4, attenDiv = 8L, scale = 1000000L)
      val ok = rows.length == got.size && got == want
      if (!ok) {
        System.err.println(s"MISMATCH edges=$edges\n got=$got\n want=$want")
      }
      ok
    }
    val r = SCTest.check(
      propParams(1220L, 10),
      prop)
    assert(r.passed, s"katz vs in-memory integer recurrence: ${r.status}")
  }
}
