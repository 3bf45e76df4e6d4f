package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of unipartite link prediction: random
  * undirected graphs vs brute force over all non-adjacent distance-2
  * pairs — common-neighbor count restricted to mid vertices under the
  * degree cap, preferential-attachment score from UNCAPPED degrees.
  * The cap (maxMidDeg) is the scale knob that prunes hub wedges at
  * 100 TB; random graphs with hubs above and below the cap pin its
  * exact semantics (a capped hub contributes NO wedges, but its own
  * degree still multiplies into pa). */
class LinkPredictPropertySpec extends SparkSpec {
  import spark.implicits._

  private def lpRef(pairs: Seq[(Long, Long)],
                    cap: Long): Map[(Long, Long), (Long, Long)] = {
    val nbrs = pairs.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (x, es) => x -> es.map(_._2).toSet }
    val edgeSet = pairs.toSet
    val verts = nbrs.keys.toSeq.sorted
    (for {
      i <- verts.indices; j <- (i + 1) until verts.size
      u = verts(i); v = verts(j)
      if !edgeSet((u, v))
      cn = (nbrs(u) intersect nbrs(v)).count(w => nbrs(w).size <= cap).toLong
      if cn > 0
    } yield (u, v) -> (cn, nbrs(u).size.toLong * nbrs(v).size)).toMap
  }

  test("linkPredict equals brute-force capped wedges on random graphs") {
    val gen = for {
      n <- Gen.choose(4, 22)
      m <- Gen.choose(n, 4 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { raw =>
      val pairs = raw.collect {
        case (a, b) if a != b => (math.min(a, b), math.max(a, b))
      }.distinct
      (pairs.nonEmpty: Prop) ==> {
        val rows = Algos.linkPredict(pairs.toDF("u", "v"), maxMidDeg = 4L)
          .as[(Long, Long, Long, Long)].collect()
        val got = rows.map { case (u, v, cn, pa) => (u, v) -> (cn, pa) }.toMap
        val want = lpRef(pairs, cap = 4L)
        val ok = rows.length == got.size && got == want
        if (!ok) {
          System.err.println(s"MISMATCH pairs=$pairs\n got=$got\n want=$want")
        }
        ok
      }
    }
    val r = SCTest.check(
      propParams(1230L, 10),
      prop)
    assert(r.passed, s"linkPredict vs brute force: ${r.status}")
  }
}
