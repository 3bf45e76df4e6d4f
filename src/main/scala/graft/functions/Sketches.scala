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
}
