package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of random-walk-with-restart
  * (personalized PageRank): random directed multigraphs vs an
  * in-memory replay of pr'(v) = [v = source]·reset + d·Σ_{u→v}
  * pr(u)/outdeg(u) over the out-degree-positive vertex set — RWR's
  * contract differs from PageRank's in exactly the places a shared
  * fixture can hide: restart mass lands ONLY on the source, there is
  * no dangling redistribution, and sink vertices carry no state (the
  * output covers out-degree-positive vertices only). Also pins the
  * multi-source batched variant against the single-source runs it
  * batches — rwrMulti's tagged frame must reproduce each source's
  * personalized vector bit-for-bit-close. */
class RwrPropertySpec extends SparkSpec {
  import spark.implicits._

  private def rwrRef(edges: Seq[(Long, Long)], source: Long, iters: Int,
                     damping: Double, reset: Double): Map[Long, Double] = {
    val od = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toDouble }
    val verts = od.keys.toSeq // out-degree-positive only
    var pr = verts.map(v => v -> (if (v == source) 1.0 else 0.0)).toMap
    for (_ <- 1 to iters) {
      val sums = edges.filter(e => verts.contains(e._2)).groupBy(_._2)
        .map { case (v, es) => v -> es.map(e => pr(e._1) / od(e._1)).sum }
      pr = verts.map(v =>
        v -> ((if (v == source) reset else 0.0) +
          damping * sums.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  private val gen = for {
    n <- Gen.choose(3, 25)
    m <- Gen.choose(n, 3 * n)
    edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
  } yield edges

  test("rwr matches the in-memory personalized power iteration") {
    val prop = Prop.forAll(gen) { edges =>
      val source = edges.map(_._1).min // guaranteed out-degree > 0
      val rows = Algos.randomWalkWithRestart(edges.toDF("src", "dst"), source, iterations = 5)
        .as[(Long, Double)].collect()
      val got = rows.toMap
      val want = rwrRef(edges, source, iters = 5, damping = 0.85, reset = 0.15)
      val ok = rows.length == got.size && got.keySet == want.keySet &&
        want.forall { case (v, p) => math.abs(got(v) - p) <= graft.SparkSpec.doubleTol(1e-8, 1e-10) }
      if (!ok) {
        System.err.println(
          s"MISMATCH source=$source edges=$edges\n got=$got\n want=$want")
      }
      ok
    }
    val r = SCTest.check(
      propParams(1234L, 10, tag = "rwr"),
      prop)
    assert(r.passed, s"rwr vs in-memory replay: ${r.status}")
  }

  test("rwrMulti reproduces each source's single-source vector") {
    val prop = Prop.forAll(gen) { edges =>
      val srcs = edges.map(_._1).distinct.sorted.take(3)
      val rows = Algos.rwrMulti(edges.toDF("src", "dst"), nSources = 3, iterations = 5)
        .select("id", "tag", "pr")
        .as[(Long, Long, Double)].collect()
      val got = rows.map { case (id, tag, pr) => (tag, id) -> pr }.toMap
      val wants = srcs.map(s =>
        s -> rwrRef(edges, s, iters = 5, damping = 0.85, reset = 0.15)).toMap
      val ok = rows.length == got.size &&
        got.keySet == wants.toSeq.flatMap { case (s, m) => m.keys.map(s -> _) }.toSet &&
        wants.forall { case (s, m) =>
          m.forall { case (v, p) => math.abs(got((s, v)) - p) <= graft.SparkSpec.doubleTol(1e-8, 1e-10) }
        }
      if (!ok) {
        System.err.println(s"MISMATCH srcs=$srcs edges=$edges\n got=$got\n wants=$wants")
      }
      ok
    }
    val r = SCTest.check(
      propParams(1236L, 10, tag = "rwrMulti"),
      prop)
    assert(r.passed, s"rwrMulti vs per-source single runs: ${r.status}")
  }
}
