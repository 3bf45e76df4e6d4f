package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, oracle-reproducible cardinality sketching.
  *
  * The classic streaming estimators (HyperLogLog — Spark's
  * approx_count_distinct — and friends) hash with engine-private
  * functions, so no cross-engine oracle can replay them. KMV (k minimum
  * values, Bar-Yossef et al. 2002) has the same bucketed-scan shape but
  * is a pure function of the input multiset once the hash is fixed:
  * hash every value with the engine-portable md5-prefix hash, keep the
  * k smallest DISTINCT hashes, estimate n ≈ (k−1)·H / h_k where h_k is
  * the k-th minimum and H the hash-space size. Both the estimate and
  * its input are exact integers — the DuckDB oracle replays them
  * bit-for-bit, which turns "is the sketch wired right?" into a
  * hash-matchable query instead of a tolerance assert.
  */
object Sketches {

  /** 60-bit engine-portable hash: value → first 15 hex digits of md5. */
  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  val HashSpace: Long = 1L << 60

  /** Per-group KMV estimate of COUNT(DISTINCT keyCol), plus the exact
    * count for honest side-by-side error inspection. Estimate arithmetic
    * is exact-integer: the numerator (k−1)·2^60 is a compile-time
    * DECIMAL(38,0) constant (it exceeds BIGINT), and `div` performs the
    * exact integral division on both engines (HUGEINT `//` in DuckDB).
    * Groups with fewer than k distinct values fall back to the exact
    * distinct count (the standard small-range KMV rule).
    *
    * Scale: one (group, hash) dedup agg + one per-group window on the ≤k
    * smallest hashes (rank pruned before the window via a min-k agg
    * would save the sort at extreme group sizes; the dedup agg already
    * collapses the data to |distinct| rows). Driver sees nothing. */
  def kmvDistinct(df: DataFrame, keyCol: String, groupCol: String, k: Int): DataFrame = {
    val hashed = df.select(col(groupCol).as("g"), h60(col(keyCol)).as("h"))
      .groupBy(col("g"), col("h")).agg(count(lit(1)).as("_dups"))
    val ranked = hashed.withColumn("rk",
      row_number().over(Window.partitionBy(col("g")).orderBy(col("h"))))
    val exact = hashed.groupBy(col("g")).agg(count(lit(1)).as("n_exact"))
    val kth = ranked.filter(col("rk") === k)
      .select(col("g"), col("h").as("hk"))
    exact.join(kth, Seq("g"), "left")
      .withColumn("kmv_est",
        when(col("hk").isNull, col("n_exact"))
          .otherwise(expr(s"CAST(CAST('${numerator(k)}' AS DECIMAL(38,0)) div hk AS BIGINT)")))
      .select(col("g"), col("n_exact"), col("kmv_est"))
      .orderBy(col("g"))
  }

  /** Count-min sketch + point estimates, fully oracle-reproducible:
    * d independent md5-derived hash rows over w buckets; a key's
    * estimate is the MIN of its d bucket counters (overestimates only,
    * by collision mass ≈ N/w per row). Building the sketch is one
    * map-side-combined (row, bucket) count — the fixed d·w-cell state
    * that makes heavy-hitter counting feasible when the key universe
    * dwarfs memory. Returns the probe keys' estimates NEXT TO their
    * exact counts so the error is measured, not guessed (same honesty
    * contract as [[kmvDistinct]]).
    *
    * Scale: the sketch agg touches d rows per input row (a generate of
    * d integers — codegen'd); the probe side joins the d·w-cell sketch
    * (broadcast — it is tiny by construction) to the probe keys. */
  def cmsEstimates(df: DataFrame, keyCol: String, probes: DataFrame,
                   d: Int = 3, w: Int = 64): DataFrame = {
    val keys = df.select(col(keyCol).cast("string").as("k"))
    val cells = keys
      .select(col("k"), explode(sequence(lit(0), lit(d - 1))).as("row"))
      .withColumn("bucket",
        pmod(conv(substring(md5(concat(col("row").cast("string"), lit(":"), col("k"))), 1, 6), 16, 10)
          .cast("long"), lit(w.toLong)))
      .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as("c"))
    val exact = keys.groupBy(col("k")).agg(count(lit(1)).as("n_exact"))
    val probeCells = probes.select(col(keyCol).cast("string").as("k"))
      .select(col("k"), explode(sequence(lit(0), lit(d - 1))).as("row"))
      .withColumn("bucket",
        pmod(conv(substring(md5(concat(col("row").cast("string"), lit(":"), col("k"))), 1, 6), 16, 10)
          .cast("long"), lit(w.toLong)))
    probeCells.join(broadcast(cells), Seq("row", "bucket"))
      .groupBy(col("k")).agg(min(col("c")).as("cms_est"))
      .join(exact, Seq("k"))
      .select(col("k"), col("n_exact"), col("cms_est"))
      .orderBy(col("k"))
  }

  /** DuckDB twin of [[cmsEstimates]] for probe keys chosen as the
    * `topN` most frequent values of `keyExpr` (ties by key). */
  def cmsEstimatesSql(table: String, keyExpr: String, topN: Int,
                      d: Int = 3, w: Int = 64): String = {
    def bucket(row: String, k: String) =
      s"""CAST(list_sum(list_transform(range(0, 6), i ->
         |(strpos('0123456789abcdef', substring(md5(CAST($row AS VARCHAR) || ':' || $k), CAST(i + 1 AS INT), 1)) - 1)
         |* CAST(power(16, 5 - i) AS BIGINT))) AS BIGINT) % $w""".stripMargin.replace('\n', ' ')
    s"""WITH keys AS (SELECT CAST($keyExpr AS VARCHAR) AS k FROM $table),
       |cells AS MATERIALIZED (SELECT row, ${bucket("row", "k")} AS bucket, COUNT(*) AS c
       |FROM keys CROSS JOIN range(0, $d) AS t(row) GROUP BY 1, 2),
       |exact AS (SELECT k, COUNT(*) AS n_exact FROM keys GROUP BY k),
       |probes AS (SELECT k FROM exact ORDER BY n_exact DESC, k LIMIT $topN),
       |pc AS (SELECT p.k, t.row, ${bucket("t.row", "p.k")} AS bucket
       |FROM probes p CROSS JOIN range(0, $d) AS t(row))
       |SELECT pc.k, exact.n_exact, MIN(cells.c) AS cms_est
       |FROM pc JOIN cells ON cells.row = pc.row AND cells.bucket = pc.bucket
       |JOIN exact ON exact.k = pc.k
       |GROUP BY pc.k, exact.n_exact ORDER BY pc.k""".stripMargin.replace('\n', ' ')
  }

  /** (k−1)·2^60 — exceeds BIGINT, carried as a decimal string. */
  private def numerator(k: Int): java.math.BigInteger =
    java.math.BigInteger.valueOf(k - 1L).multiply(java.math.BigInteger.valueOf(HashSpace))

  /** DuckDB twin of [[kmvDistinct]]: same md5-prefix hash (hex-literal
    * cast), same rank rule, same exact-integer estimate. */
  def kmvDistinctSql(table: String, keyExpr: String, groupCol: String, k: Int): String =
    s"""WITH hashed AS (SELECT $groupCol AS g,
       |CAST(('0x' || substring(md5(CAST($keyExpr AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |FROM $table GROUP BY 1, 2),
       |ranked AS (SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rk FROM hashed),
       |ex AS (SELECT g, COUNT(*) AS n_exact FROM hashed GROUP BY g),
       |kth AS (SELECT g, h AS hk FROM ranked WHERE rk = $k)
       |SELECT ex.g, ex.n_exact,
       |CASE WHEN kth.hk IS NULL THEN ex.n_exact
       |ELSE CAST(CAST('${numerator(k)}' AS HUGEINT) // kth.hk AS BIGINT)
       |END AS kmv_est
       |FROM ex LEFT JOIN kth ON ex.g = kth.g ORDER BY ex.g""".stripMargin.replace('\n', ' ')

  /** Deterministic HyperLogLog (Flajolet et al. 2007), m = 64 registers,
    * engine-portable: hash = first 8 md5 hex digits (32 bits), bucket =
    * h mod 64, and ρ = leading-zero count of the remaining 26-bit word
    * + 1 computed EXACTLY as 27 − length(bin(w)) — both engines print
    * the same minimal binary string, so ρ needs no log2 and no doubles.
    * The raw estimate α·m²/Z is one integral division: Z is kept scaled
    * by 2²⁷ (every register term 2^(27−ρ) is an exact BIGINT, unhit
    * registers contribute 2²⁷ each), α_64 = 709/1000 per the paper, so
    * est_e2 = (709·m²·2²⁷·100) div (1000·Z_scaled) on identical BIGINT
    * operands. No small-range correction — the raw estimator is the
    * deterministic contract; n_exact rides along for error inspection.
    *
    * Scale: ONE map-side-combined (group, bucket) max agg over the scan
    * — 64 rows per group reach the reduce side, vs the full sort KMV
    * needs. This is the estimator to swap in when exact distinct (the
    * q_profile Expand) stops fitting; Spark's approx_count_distinct is
    * the same algorithm with an engine-private hash (no oracle). */
  def hllDistinct(df: DataFrame, keyCol: String, groupCol: String): DataFrame = {
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long")
    val regs = df.select(col(groupCol).as("g"), h.as("h"))
      .select(col("g"), pmod(col("h"), lit(64L)).as("b"), expr("h div 64").as("w"))
      .select(col("g"), col("b"),
        when(col("w") === 0, lit(27L))
          .otherwise(lit(27L) - length(bin(col("w")))).as("rho"))
      .groupBy(col("g"), col("b")).agg(max(col("rho")).as("r"))
    val exact = df.groupBy(col(groupCol).as("g"))
      .agg(countDistinct(col(keyCol)).as("n_exact"))
    val num = 709L * 64L * 64L * (1L << 27) * 100L
    regs.groupBy(col("g"))
      .agg(sum(expr("shiftleft(cast(1 as bigint), cast(27 - r as int))")).as("z_hit"),
        count(lit(1)).as("n_hit"))
      .select(col("g"), col("n_hit"),
        (col("z_hit") + (lit(64L) - col("n_hit")) * lit(1L << 27)).as("z_scaled"))
      .join(exact, Seq("g"))
      .select(col("g"), col("n_exact"), col("n_hit"), col("z_scaled"),
        expr(s"$num div (1000 * z_scaled)").as("hll_est_e2"))
      .orderBy(col("g"))
  }

  /** Engine-portable (bucket, ρ) pre-aggregation columns — shared by
    * the batch estimator above and the STREAMING register maintenance
    * (EventStreams.hllWindowed): max(ρ) per bucket is associative and
    * commutative, so registers survive any partial-agg topology —
    * micro-batches, shuffle partials, state-store merges alike. */
  private def h32(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  def hllBucket(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(h32(key), lit(64L))

  def hllRho(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val w = shiftright(h32(key), 6) // == h div 64, nonneg
    when(w === 0, lit(27L)).otherwise(lit(27L) - length(bin(w)))
  }

  /** Finalize (group, r) registers (one row per HIT bucket) to the
    * scaled-Z + estimate of [[hllDistinct]] — identical arithmetic. */
  def hllFinalize(regs: DataFrame, groupCol: String): DataFrame = {
    val num = 709L * 64L * 64L * (1L << 27) * 100L
    regs.groupBy(col(groupCol).as("g"))
      .agg(sum(expr("shiftleft(cast(1 as bigint), cast(27 - r as int))")).as("z_hit"),
        count(lit(1)).as("n_hit"))
      .select(col("g"), col("n_hit"),
        (col("z_hit") + (lit(64L) - col("n_hit")) * lit(1L << 27)).as("z_scaled"))
      .select(col("g"), col("n_hit"), col("z_scaled"),
        expr(s"$num div (1000 * z_scaled)").as("hll_est_e2"))
  }

  /** DuckDB twin of [[hllDistinct]]. */
  def hllDistinctSql(table: String, keyExpr: String, groupCol: String): String = {
    val num = 709L * 64L * 64L * (1L << 27) * 100L
    s"""WITH h AS (SELECT $groupCol AS g,
       |CAST(('0x' || substring(md5(CAST($keyExpr AS VARCHAR)), 1, 8)) AS BIGINT) AS h
       |FROM $table),
       |s AS (SELECT g, h % 64 AS b, h // 64 AS w FROM h),
       |r AS (SELECT g, b,
       |MAX(CASE WHEN w = 0 THEN 27 ELSE 27 - length(bin(w)) END) AS r
       |FROM s GROUP BY 1, 2),
       |z AS (SELECT g, COUNT(*) AS n_hit,
       |CAST(SUM(CAST(1 AS BIGINT) << CAST(27 - r AS INT)) AS BIGINT)
       |+ (64 - COUNT(*)) * 134217728 AS z_scaled FROM r GROUP BY 1),
       |e AS (SELECT $groupCol AS g, COUNT(DISTINCT $keyExpr) AS n_exact FROM $table GROUP BY 1)
       |SELECT z.g, n_exact, n_hit, z_scaled,
       |CAST($num // (1000 * z_scaled) AS BIGINT) AS hll_est_e2
       |FROM z JOIN e ON z.g = e.g ORDER BY z.g""".stripMargin.replace('\n', ' ')
  }
}
