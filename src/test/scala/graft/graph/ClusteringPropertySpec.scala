package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the per-vertex triangle count + local
  * clustering coefficient: random undirected graphs against brute-force
  * triple enumeration. TrianglePropertySpec already pins the GLOBAL
  * count; this pins the per-vertex CREDITING path — the single
  * posexplode pass that credits each closed edge's two pivots with the
  * intersection size and each third corner with 1 — which a correct
  * global sum cannot distinguish from a mis-attributed one. The cc_e6
  * replica mirrors the engine's exact double chain:
  * floor((2·tri / (d·(d−1))) · 10⁶). */
class ClusteringPropertySpec extends SparkSpec {
  import spark.implicits._

  private def ccRef(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val nbrs = pairs.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (x, es) => x -> es.map(_._2).toSet }
    val verts = nbrs.keys.toSeq
    verts.map { v =>
      val nv = nbrs(v)
      // triangles at v = closed neighbor pairs
      val tri = nv.toSeq.combinations(2).count {
        case Seq(a, b) => nbrs(a).contains(b)
      }.toLong
      val d = nv.size.toLong
      val cc = if (d >= 2)
        math.floor((2L * tri).toDouble / (d * (d - 1)).toDouble * 1000000.0).toLong
      else 0L
      v -> (tri, cc)
    }.toMap
  }

  test("clusteringCoefficient equals brute-force triples on random graphs") {
    val gen = for {
      n <- Gen.choose(4, 20)
      m <- Gen.choose(n, 4 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { raw =>
      val pairs = raw.collect {
        case (a, b) if a != b => (math.min(a, b), math.max(a, b))
      }.distinct
      (pairs.nonEmpty: Prop) ==> {
        val rows = Algos.clusteringCoefficient(pairs.toDF("u", "v"))
          .as[(Long, Long, Long)].collect()
        val got = rows.map { case (id, t, c) => id -> (t, c) }.toMap
        val want = ccRef(pairs)
        val ok = rows.length == got.size && got == want
        if (!ok) {
          System.err.println(s"MISMATCH pairs=$pairs\n got=$got\n want=$want")
        }
        ok
      }
    }
    val r = SCTest.check(
      propParams(1223L, 10),
      prop)
    assert(r.passed, s"clusteringCoefficient vs brute force: ${r.status}")
  }
}
