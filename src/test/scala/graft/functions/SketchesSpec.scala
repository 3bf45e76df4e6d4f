package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmv falls back to the exact count below k distinct") {
    val df = (0 until 200).map(i => ("small", i % 40)).toDF("g", "k")
    val r = Sketches.kmvDistinct(df, "k", "g", k = 64)
      .as[(String, Long, Long)].collect().head
    assert(r == (("small", 40L, 40L)))
  }

  test("kmv estimate lands within 30% of a 2000-distinct truth") {
    // 64 minima over 2000 uniform hashes: relative error ~1/sqrt(k−2) ≈ 13%
    val df = (0 until 6000).map(i => ("big", i % 2000)).toDF("g", "k")
    val r = Sketches.kmvDistinct(df, "k", "g", k = 64)
      .as[(String, Long, Long)].collect().head
    assert(r._2 == 2000L)
    assert(math.abs(r._3 - 2000L) <= 600L, s"estimate ${r._3}")
  }

  test("cms estimates never undercount and are exact without collisions") {
    import org.apache.spark.sql.functions.col
    // 4 keys, w=64: collision-free with overwhelming likelihood under
    // md5 — estimates must equal exact counts; with heavy load (w=2)
    // they must only ever overestimate
    val df = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
      .toDF("k")
    val probes = Seq("a", "b", "c", "d").toDF("k")
    val wide = Sketches.cmsEstimates(df, "k", probes, d = 3, w = 64)
      .as[(String, Long, Long)].collect()
      .map { case (k, n, e) => k -> ((n, e)) }.toMap
    assert(wide == Map("a" -> ((10L, 10L)), "b" -> ((5L, 5L)),
      "c" -> ((2L, 2L)), "d" -> ((1L, 1L))))
    val tight = Sketches.cmsEstimates(df, "k", probes, d = 2, w = 2)
      .select(col("n_exact"), col("cms_est")).as[(Long, Long)].collect()
    assert(tight.forall { case (n, e) => e >= n })
  }

  test("kmv estimate is invariant under duplication and partitioning") {
    val base = (0 until 1000).map(i => ("g", i)).toDF("g", "k")
    val est1 = Sketches.kmvDistinct(base, "k", "g", 32)
      .select(col("kmv_est")).as[Long].collect().head
    val est2 = Sketches.kmvDistinct(
        base.union(base).repartition(7), "k", "g", 32)
      .select(col("kmv_est")).as[Long].collect().head
    assert(est1 == est2)
  }

  test("hll estimate is duplication/partition-invariant and within 30% at n=5000") {
    val base = (0 until 5000).map(i => ("g", i)).toDF("g", "k")
    val r1 = Sketches.hllDistinct(base, "k", "g")
      .select(col("n_exact"), col("z_scaled"), col("hll_est_e2"))
      .as[(Long, Long, Long)].collect().head
    val r2 = Sketches.hllDistinct(base.union(base).repartition(7), "k", "g")
      .select(col("n_exact"), col("z_scaled"), col("hll_est_e2"))
      .as[(Long, Long, Long)].collect().head
    assert(r1 == r2)
    assert(r1._1 == 5000L)
    // raw HLL at m=64: typical error 1.04/sqrt(64) = 13%; assert a loose 30%
    val est = r1._3 / 100.0
    assert(est > 3500 && est < 6500, s"est=$est")
  }

  test("hll registers cover all buckets at large n and rho stays in [1, 27]") {
    val base = (0 until 20000).map(i => ("g", i)).toDF("g", "k")
    val row = Sketches.hllDistinct(base, "k", "g")
      .select(col("n_hit"), col("z_scaled")).as[(Long, Long)].collect().head
    assert(row._1 == 64L)
    // all buckets hit with rho >= 1 => z_scaled < 64 * 2^26, and > 0
    assert(row._2 > 0L && row._2 <= 64L * (1L << 26))
  }
}
