package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of SALSA: random directed multigraphs vs
  * an in-memory replay of the degree-averaged mutual recursion
  * a(v) = Σ_{u→v} h(u)/outdeg(u) then L1-normalize, h(u) = Σ_{u→v}
  * a(v)/indeg(v) then L1-normalize. The degree division BEFORE
  * propagation is what separates SALSA from HITS (TKC robustness); a
  * swapped or missing division collapses to HITS-like mass and misses
  * by ~1e-1 where the tolerance is 1e-8 (reassociation-proof slack,
  * seed-validated at 1e-9). Parallel edges contribute one
  * share per ROW and inflate the divisor degrees the same way in both
  * engines. */
class SalsaPropertySpec extends SparkSpec {
  import spark.implicits._

  private def salsaRef(edges: Seq[(Long, Long)],
                       iters: Int): Map[Long, (Double, Double)] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val od = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toDouble }
    val idg = edges.groupBy(_._2).map { case (v, es) => v -> es.size.toDouble }
    var h = verts.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    for (_ <- 1 to iters) {
      val araw = verts.map(v =>
        v -> edges.filter(_._2 == v).map(e => h(e._1) / od(e._1)).sum).toMap
      val as = araw.values.sum
      a = araw.map { case (v, x) => v -> x / as }
      val hraw = verts.map(u =>
        u -> edges.filter(_._1 == u).map(e => a(e._2) / idg(e._2)).sum).toMap
      val hs = hraw.values.sum
      h = hraw.map { case (u, x) => u -> x / hs }
    }
    verts.map(v => v -> (a(v), h(v))).toMap
  }

  test("salsa matches the in-memory degree-averaged recursion") {
    val gen = for {
      n <- Gen.choose(3, 25)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val rows = Algos.salsa(edges.toDF("src", "dst"), iterations = 4)
        .as[(Long, Double, Double)].collect()
      val got = rows.map { case (v, au, hu) => v -> (au, hu) }.toMap
      val want = salsaRef(edges, iters = 4)
      val ok = rows.length == got.size &&
        got.keySet == want.keySet && want.forall { case (v, (wa, wh)) =>
        math.abs(got(v)._1 - wa) <= graft.SparkSpec.doubleTol(1e-8, 1e-9) && math.abs(got(v)._2 - wh) <= graft.SparkSpec.doubleTol(1e-8, 1e-9)
      }
      if (!ok) {
        System.err.println(s"MISMATCH edges=$edges\n got=$got\n want=$want")
      }
      ok
    }
    val r = SCTest.check(
      propParams(1231L, 10),
      prop)
    assert(r.passed, s"salsa vs in-memory recursion: ${r.status}")
  }
}
