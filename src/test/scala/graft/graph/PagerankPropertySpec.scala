package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of PageRank with dangling-mass
  * redistribution: ScalaCheck-random directed multigraphs (dangling
  * vertices arise naturally — any sink; parallel edges contribute one
  * share each, exactly like the engine's row-level contribution join)
  * against an in-memory power-iteration replay of the same recurrence
  * pr' = reset/n + d·(Σ pr(u)/outdeg(u) + dang/n). Comparison is
  * per-vertex |Δ| ≤ 1e-8: the two sides share the arithmetic but not
  * the summation ORDER, so exact equality is not the contract, and the
  * tolerance must survive legitimate reassociation on EITHER side (a
  * future Kahan/AQE re-aggregation is still correct) — 1e-8 on values
  * of magnitude ~1/n leaves ~6 orders of slack above float-reassoc
  * noise (~1e-14 here, seed-validated at 1e-10 through round 12) and
  * ~6 below a real defect (a dropped dangling share or missed parallel
  * edge shows at ~1e-2). Also asserts Σ pr = 1 (mass conservation). */
class PagerankPropertySpec extends SparkSpec {
  import spark.implicits._

  private def pagerankRef(edges: Seq[(Long, Long)], iters: Int,
                          damping: Double, reset: Double): Map[Long, Double] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val n = verts.size.toDouble
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toDouble }
    var pr = verts.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val sums = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => pr(e._1) / outdeg(e._1)).sum
      }
      val dang = verts.filterNot(outdeg.contains).map(pr).sum
      pr = verts.map(v =>
        v -> (reset / n + damping * (sums.getOrElse(v, 0.0) + dang / n))).toMap
    }
    pr
  }

  test("pagerank matches in-memory power iteration on random digraphs") {
    val gen = for {
      n <- Gen.choose(3, 30)
      m <- Gen.choose(n / 2, 3 * n) // sparse end → plenty of dangling sinks
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val rows = Algos.pagerank(edges.toDF("src", "dst"), iterations = 5)
        .as[(Long, Double)].collect()
      val got = rows.toMap
      val want = pagerankRef(edges, iters = 5, damping = 0.85, reset = 0.15)
      val sameKeys = rows.length == got.size && got.keySet == want.keySet
      val close = sameKeys && want.forall { case (v, p) => math.abs(got(v) - p) <= graft.SparkSpec.doubleTol(1e-8, 1e-10) }
      val mass = math.abs(got.values.sum - 1.0) <= 1e-9
      if (!(close && mass)) {
        System.err.println(
          s"MISMATCH edges=$edges\n got=$got\n want=$want\n mass=${got.values.sum}")
      }
      close && mass
    }
    val r = SCTest.check(
      propParams(1221L, 10),
      prop)
    assert(r.passed, s"pagerank vs in-memory power iteration: ${r.status}")
  }
}
