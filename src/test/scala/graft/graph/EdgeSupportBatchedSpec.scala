package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The bounded-scratch batched support pass must be EXACTLY the
  * single-pass one on every shape: `edgeSupport` with batches > 1
  * splits the pivot-edge side of the triangle enumeration by
  * xxhash64(src) % batches and sums per-batch pre-aggregated credits —
  * each triangle lives at exactly one pivot edge, so the partition is
  * exact by construction. Random canonical-pair graphs (the kTruss /
  * edgeJaccard input shape) compare batched vs unbatched support maps;
  * 3 batches exercises real splitting, partial-credit checkpoints, and
  * the cross-batch final sum (an edge's three credits can arrive from
  * three different batches). */
class EdgeSupportBatchedSpec extends SparkSpec {
  import spark.implicits._

  test("batched edgeSupport equals single-pass on random graphs") {
    val gen = for {
      n <- Gen.choose(4, 30)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct
    val prop = Prop.forAll(gen) { pairs =>
      pairs.isEmpty || {
        val df = pairs.toDF("u", "v")
        val plain = Algos.edgeSupport(df, 1)
          .as[(Long, Long, Long)].collect().toSet
        val batched = Algos.edgeSupport(df, 3)
          .as[(Long, Long, Long)].collect().toSet
        if (plain != batched) {
          System.err.println(s"MISMATCH pairs=$pairs\n plain=$plain\n batched=$batched")
        }
        plain == batched
      }
    }
    val r = SCTest.check(
      propParams(1222L, 10),
      prop)
    assert(r.passed, s"batched vs single-pass edgeSupport: ${r.status}")
  }
}
