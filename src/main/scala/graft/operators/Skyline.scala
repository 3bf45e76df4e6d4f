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
  * skyline-sized, ≪ n — enter the stage-2 global window. The global
  * stage is single-partition by construction, which is exactly why it
  * runs on the pruned set; at 100 TB the stage-1 reduction is what
  * keeps it a driver-scale sort.
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

    def pass(in: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      in.withColumn("prev_max",
          max(col("maxv")).over(w.orderBy(col("minv").asc, col("maxv").desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("prev_max").isNull || col("prev_max") < col("maxv"))
        .drop("prev_max")

    val local = pass(
      pairs.withColumn("b", pmod(hash(col("minv"), col("maxv")), lit(buckets))),
      Window.partitionBy(col("b"))).drop("b")
    pass(local, Window.partitionBy())
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
