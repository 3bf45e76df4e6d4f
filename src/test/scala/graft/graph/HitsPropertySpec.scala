package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of HITS: ScalaCheck-random directed
  * multigraphs against an in-memory replay of the per-iteration
  * L1-normalized mutual recursion a(v) = Σ_{u→v} h(u) / ‖·‖₁,
  * h(u) = Σ_{u→v} a(v) / ‖·‖₁. The dense-replay SQL oracle covers the
  * one fixture graph; this covers random shapes — sinks and sources
  * that zero out a side, parallel edges contributing one share per ROW,
  * disconnected stars. Per-vertex |Δ| ≤ 1e-8 (shared arithmetic,
  * different summation order — the slack must survive legitimate
  * reassociation such as Kahan or AQE re-aggregation, seed-validated
  * at 1e-9; a dropped edge or mis-normalized round shows at ~1e-2). */
class HitsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def hitsRef(edges: Seq[(Long, Long)],
                      iters: Int): Map[Long, (Double, Double)] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var h = verts.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    for (_ <- 1 to iters) {
      val araw = verts.map(v =>
        v -> edges.filter(_._2 == v).map(e => h(e._1)).sum).toMap
      val as = araw.values.sum
      a = araw.map { case (v, x) => v -> x / as }
      val hraw = verts.map(v =>
        v -> edges.filter(_._1 == v).map(e => a(e._2)).sum).toMap
      val hs = hraw.values.sum
      h = hraw.map { case (v, x) => v -> x / hs }
    }
    verts.map(v => v -> (a(v), h(v))).toMap
  }

  test("hits matches in-memory normalized power iteration") {
    val gen = for {
      n <- Gen.choose(3, 25)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val rows = Algos.hits(edges.toDF("src", "dst"), iterations = 4)
        .as[(Long, Double, Double)].collect()
      val got = rows.map { case (v, au, hu) => v -> (au, hu) }.toMap
      val want = hitsRef(edges, iters = 4)
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
      propParams(1226L, 10),
      prop)
    assert(r.passed, s"hits vs in-memory power iteration: ${r.status}")
  }
}
