package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of edge-neighborhood Jaccard: random
  * undirected graphs (canonicalized u < v, as the operator's contract
  * requires) against a brute-force set-intersection oracle. This
  * exercises the full edgeSupport composition — degree orientation,
  * adjacency intersection, the 3-way canonical-edge crediting union and
  * the 0-fill — plus the exact integer jac_e6 = s·10⁶ div (du+dv−2−s)
  * arithmetic, on shapes (stars inside cliques, bridges, isolated
  * edges) the fixed fixtures never generate. topK is set above the edge
  * count so the comparison is over the COMPLETE per-edge output, not a
  * prefix. */
class EdgeJaccardPropertySpec extends SparkSpec {
  import spark.implicits._

  private def jaccardRef(pairs: Seq[(Long, Long)]): Map[(Long, Long), (Long, Long)] = {
    val nbrs = pairs.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (x, es) => x -> es.map(_._2).toSet }
    pairs.map { case (u, v) =>
      val s = (nbrs(u) intersect nbrs(v)).size.toLong
      val denom = nbrs(u).size + nbrs(v).size - 2 - s
      val jac = if (denom > 0) s * 1000000L / denom else 1000000L
      (u, v) -> (s, jac)
    }.toMap
  }

  test("edgeJaccard equals brute-force set intersection on random graphs") {
    val gen = for {
      n <- Gen.choose(4, 25)
      m <- Gen.choose(n, 4 * n) // dense end → real triangle support
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { raw =>
      val pairs = raw.collect {
        case (a, b) if a != b => (math.min(a, b), math.max(a, b))
      }.distinct
      (pairs.nonEmpty: Prop) ==> {
        val rows = Algos.edgeJaccard(pairs.toDF("u", "v"), topK = 100000)
          .as[(Long, Long, Long, Long)].collect()
        val got = rows.map { case (u, v, s, j) => (u, v) -> (s, j) }.toMap
        val want = jaccardRef(pairs)
        val ok = rows.length == got.size && got == want
        if (!ok) {
          System.err.println(s"MISMATCH pairs=$pairs\n got=$got\n want=$want")
        }
        ok
      }
    }
    val r = SCTest.check(
      propParams(1222L, 10),
      prop)
    assert(r.passed, s"edgeJaccard vs brute force: ${r.status}")
  }
}
