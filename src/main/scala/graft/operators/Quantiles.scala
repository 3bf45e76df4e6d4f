package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles with pure integer arithmetic.
  *
  * Semantics: the standard continuous-quantile definition (SQL
  * quantile_cont / Spark `percentile`): for p = num/den over n sorted
  * values v_0..v_{n-1}, position pos = p·(n−1) = r + rem/den, result
  * v_r + (v_{r+1} − v_r)·rem/den. Computed entirely in scaled BIGINTs —
  * no doubles anywhere — so a SQL oracle reproduces it bit-exactly
  * (cross-engine double interpolation is a documented ulp trap; see
  * graft.sql.Exact).
  *
  * Scale: one rank pass (row_number per group — the per-group sort any
  * exact quantile fundamentally needs, shuffle on the group key), one
  * tiny count agg, then two equi-joins ON (group, rank) that touch only
  * |groups|·|ps| rows. The sketch alternative for when an exact sort is
  * too expensive at 100 TB is percentile_approx (Spark built-in, no
  * oracle — documented trade, SURVEY §2.10).
  */
object Quantiles {

  /** Exact scaled quantiles of integral column `valueCol` per
    * `groupCol`. `ps` are rationals (num, den); output value is
    * q_scaled = v_r·scale + ⌊(v_{r+1}−v_r)·scale·rem/den⌋, one row per
    * (group, p). Requires scale·max|v| and den·(n−1) within BIGINT —
    * callers pass corpus-bounded scales. */
  def exactScaled(df: DataFrame, valueCol: String, groupCol: String,
                  ps: Seq[(Int, Int)], scale: Long): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val v = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    // rank within group: ties ordered arbitrarily among EQUAL values, so
    // v_r is still a pure function of the multiset. The interpolation
    // neighbor v_{r+1} rides the SAME window as lead() — one sort pass,
    // one scan (a second rank join would re-scan and re-sort the fact
    // table; .explain showed zero exchange reuse)
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    val ranked = v.select(col("g"), col("v"),
      (row_number().over(w) - lit(1)).as("rr"),
      lead(col("v"), 1).over(w).as("v_next"))
    val counts = v.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val pFrame = ps.toDF("pnum", "pden")
    val idx = counts.crossJoin(broadcast(pFrame))
      .withColumn("rr", expr("(pnum * (n - 1)) div pden"))
      .withColumn("rem", expr("(pnum * (n - 1)) % pden"))
    idx.join(ranked, Seq("g", "rr"))
      .select(col("g"), col("pnum"), col("pden"),
        col("v").as("vlo"), coalesce(col("v_next"), col("v")).as("vhi"),
        col("rem"))
      .select(col("g"), col("pnum"), col("pden"),
        (col("vlo") * lit(scale) +
          expr(s"((vhi - vlo) * $scale * rem) div pden")).as("q_scaled"))
      .orderBy(col("g"), col("pnum"), col("pden"))
  }

  /** [[exactScaled]] for a SINGLE global group. The grouped form's
    * `Window.partitionBy(g)` with a constant group is constant-folded by
    * Catalyst into a zero-partition window — a single-partition sort of
    * the whole value frame (the exact scale-killer the plan lint hunts).
    * Here the rank pass runs on [[DistributedRank.withRowNumber]]
    * (range-partitioned offset rank) and the interpolation neighbor
    * v_{r+1} comes from a rank equi-join (the lead() of a total order,
    * without the window). Output schema and arithmetic are identical to
    * [[exactScaled]] with group ≡ `groupName`, so [[exactScaledSql]]
    * remains the oracle. */
  def exactScaledGlobal(df: DataFrame, valueCol: String, groupName: String,
                        ps: Seq[(Int, Int)], scale: Long): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val v = df.select(col(valueCol).cast("long").as("v"))
    val ranked0 = DistributedRank.withRowNumber(v, Seq(col("v")), "rn")
    val nxt = ranked0.select((col("rn") - 2).as("rr"), col("v").as("v_next"))
    val ranked = ranked0.select((col("rn") - 1).as("rr"), col("v"))
      .join(nxt, Seq("rr"), "left")
    val counts = v.agg(count(lit(1)).as("n"))
    val pFrame = ps.toDF("pnum", "pden")
    val idx = counts.crossJoin(broadcast(pFrame))
      .withColumn("rr", expr("(pnum * (n - 1)) div pden"))
      .withColumn("rem", expr("(pnum * (n - 1)) % pden"))
    idx.join(ranked, Seq("rr"))
      .select(lit(groupName).as("g"), col("pnum"), col("pden"),
        col("v").as("vlo"), coalesce(col("v_next"), col("v")).as("vhi"),
        col("rem"))
      .select(col("g"), col("pnum"), col("pden"),
        (col("vlo") * lit(scale) +
          expr(s"((vhi - vlo) * $scale * rem) div pden")).as("q_scaled"))
      .orderBy(col("g"), col("pnum"), col("pden"))
  }

  /** Lower weighted median per group: the smallest v whose running
    * weight reaches half the total — 2·cumw ≥ W in exact integers, no
    * halving division. The survey/econometrics aggregate (quantity-
    * weighted price, population-weighted income) Spark lacks natively.
    * Same shape as [[exactScaled]]: one per-group sort window + a tiny
    * total agg + one broadcast join; the conditional min replaces the
    * rank equi-join (no second pass). */
  def weightedMedian(df: DataFrame, valueCol: String, weightCol: String,
                     groupCol: String): DataFrame = {
    val v = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"),
      col(weightCol).cast("long").as("w"))
    val win = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = v.withColumn("cumw", sum(col("w")).over(win))
    val tot = v.groupBy(col("g")).agg(sum(col("w")).cast("long").as("tw"))
    cum.join(broadcast(tot), Seq("g"))
      .groupBy(col("g"), col("tw"))
      .agg(min(when(col("cumw") * 2 >= col("tw"), col("v"))).as("wmedian"))
      .select(col("g"), col("tw"), col("wmedian"))
      .orderBy(col("g"))
  }

  /** DuckDB twin of [[weightedMedian]]. */
  def weightedMedianSql(table: String, valueExpr: String, weightExpr: String,
                        groupCol: String): String =
    s"""WITH v AS (SELECT $groupCol AS g, $valueExpr AS v, $weightExpr AS w FROM $table),
       |c AS (SELECT g, v, SUM(w) OVER (PARTITION BY g ORDER BY v
       |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw FROM v),
       |t AS (SELECT g, CAST(SUM(w) AS BIGINT) AS tw FROM v GROUP BY 1)
       |SELECT c.g, tw, CAST(MIN(CASE WHEN cumw * 2 >= tw THEN v END) AS BIGINT) AS wmedian
       |FROM c JOIN t ON c.g = t.g GROUP BY 1, 2 ORDER BY c.g""".stripMargin.replace('\n', ' ')

  /** DuckDB twin of [[exactScaled]] over table `table`, value expression
    * `valueExpr` (must already be BIGINT), group column `groupCol`. */
  def exactScaledSql(table: String, valueExpr: String, groupCol: String,
                     ps: Seq[(Int, Int)], scale: Long): String = {
    val values = ps.map { case (n, d) => s"($n, $d)" }.mkString(", ")
    s"""WITH v AS (SELECT $groupCol AS g, $valueExpr AS v FROM $table),
       |rk AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) - 1 AS r FROM v),
       |n AS (SELECT g, COUNT(*) AS n FROM v GROUP BY g),
       |p AS (SELECT * FROM (VALUES $values) AS t(pnum, pden)),
       |idx AS (SELECT n.g, pnum, pden, (pnum * (n - 1)) // pden AS rr,
       |(pnum * (n - 1)) % pden AS rem FROM n CROSS JOIN p),
       |lo AS (SELECT idx.*, rk.v AS vlo FROM idx JOIN rk ON rk.g = idx.g AND rk.r = idx.rr),
       |hi AS (SELECT lo.*, COALESCE(rk.v, lo.vlo) AS vhi FROM lo
       |LEFT JOIN rk ON rk.g = lo.g AND rk.r = lo.rr + 1)
       |SELECT g, pnum, pden,
       |vlo * $scale + ((vhi - vlo) * $scale * rem) // pden AS q_scaled
       |FROM hi ORDER BY g, pnum, pden""".stripMargin.replace('\n', ' ')
  }
}
