package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the distributed k-core peeler: random
  * simple graphs against a direct in-memory peel-until-stable loop
  * sharing no code with the DataFrame operator. The fused
  * checkpoint+count convergence rule (stop when no edge falls) and the
  * final in-core degree annotation must agree exactly for every random
  * shape and several k — the degree-peeling companion to
  * [[KTrussPropertySpec]]'s triangle peeler. */
class KCorePropertySpec extends SparkSpec {
  import spark.implicits._

  /** In-memory k-core: drop vertices of degree < k over the surviving
    * subgraph until stable; returns survivors with in-core degree. */
  private def kCoreRef(edges: Set[(Long, Long)], k: Int): Map[Long, Long] = {
    var es = edges
    var changed = true
    while (changed) {
      val deg = es.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (v, o) => v -> o.size.toLong }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(p => keep(p._1) && keep(p._2))
      changed = next != es
      es = next
    }
    es.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (v, o) => v -> o.size.toLong }
  }

  test("kCore equals the in-memory peeler on random graphs") {
    val gen = for {
      n <- Gen.choose(5, 20)
      m <- Gen.choose(n, 4 * n)
      k <- Gen.choose(2, 4)
      raw <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield (raw, k)
    val prop = Prop.forAll(gen) { case (raw, k) =>
      // canonical simple graph, then SYMMETRIC edges (the operator's
      // input contract: kCore takes symEdges and degrees count ends)
      val pairs = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b))
      }.distinct
      if (pairs.isEmpty) true
      else {
        val sym = pairs.flatMap(p => Seq(p, p.swap))
        val got = Algos.kCore(sym.toDF("src", "dst"), k)
          .as[(Long, Long)].collect().toMap
        val want = kCoreRef(pairs.toSet, k)
        if (got != want) {
          System.err.println(s"MISMATCH k=$k pairs=$pairs\n got=$got\n want=$want")
        }
        got == want
      }
    }
    val r = SCTest.check(
      propParams(1216L, 8),
      prop)
    assert(r.passed, s"kCore vs in-memory peeler: ${r.status}")
  }
}
