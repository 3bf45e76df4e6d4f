package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed skyline (Pareto-frontier) operator: the rows not weakly
  * dominated on a (minimize, maximize) objective pair. A point (p, s)
  * is dominated iff some other point has p' ≤ p AND s' ≥ s with at
  * least one strict — the classic multi-objective "dominance" query
  * (Börzsönyi et al., ICDE 2001; no reference counterpart — the
  * engine's relational surface inherits it as a first-class operator).
  *
  * Algorithm: sort-filter skyline in a window. Over DISTINCT objective
  * pairs ordered (minv ASC, maxv DESC), every strictly-preceding row
  * has minv' < minv, or minv' = minv with maxv' > maxv — in both cases
  * it dominates the current row iff maxv' ≥ maxv. So a pair is on the
  * skyline iff the running max of maxv over [unbounded, -1] is null or
  * < maxv: one sort, one window pass, no self-join and no O(n²)
  * dominance pairs.
  *
  * Scale: dominance within ANY subset implies global dominance, so
  * stage 1 prunes per hash-bucket (window partitioned by bucket — a
  * plain shuffle, no global sort), and only the per-bucket survivors —
  * skyline-sized, ≪ n — enter stage 2. Stage 2's global sweep runs on
  * [[DistributedRank.withStrictPrefixMax]] (range-partitioned prefix
  * max + broadcast partition offsets), so even an adversarial
  * (anti-correlated) input whose skyline IS O(n) never single-partitions
  * — the sweep stays N-way parallel at any survivor count.
  */
object Skyline {

  /** Skyline of `df` minimizing `minCol`, maximizing `maxCol`; both
    * integral. Returns one row per distinct surviving (minv, maxv)
    * pair with `n_rows`, the number of input rows carrying it. */
  def skyline(df: DataFrame, minCol: String, maxCol: String,
              buckets: Int = 32): DataFrame = {
    val pairs = df
      .select(col(minCol).cast("long").as("minv"), col(maxCol).cast("long").as("maxv"))
      .groupBy(col("minv"), col("maxv")).agg(count(lit(1)).as("n_rows"))

    val local = pairs
      .withColumn("b", pmod(hash(col("minv"), col("maxv")), lit(buckets)))
      .withColumn("prev_max",
        max(col("maxv")).over(Window.partitionBy(col("b"))
          .orderBy(col("minv").asc, col("maxv").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("prev_max").isNull || col("prev_max") < col("maxv"))
      .drop("prev_max", "b")
    DistributedRank.withStrictPrefixMax(local,
        Seq(col("minv").asc, col("maxv").desc), col("maxv"), "prev_max")
      .filter(col("prev_max").isNull || col("prev_max") < col("maxv"))
      .drop("prev_max")
  }

  /** DuckDB twin over `table`: single global pass (sound because the
    * two-stage plan is result-invisible pruning). */
  def skylineSql(table: String, minExpr: String, maxExpr: String): String =
    s"""WITH pairs AS (SELECT $minExpr AS minv, $maxExpr AS maxv,
       |COUNT(*) AS n_rows FROM $table GROUP BY 1, 2),
       |flagged AS (SELECT minv, maxv, n_rows,
       |MAX(maxv) OVER (ORDER BY minv ASC, maxv DESC
       |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       |FROM pairs)
       |SELECT minv, maxv, n_rows FROM flagged
       |WHERE prev_max IS NULL OR prev_max < maxv""".stripMargin.replace('\n', ' ')
}
