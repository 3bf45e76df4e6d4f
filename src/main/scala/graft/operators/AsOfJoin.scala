package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the right row with the
  * greatest timestamp ≤ (or < when `inclusive=false`) the left row's
  * timestamp, per join key — the canonical "latest reading as of event
  * time" enrichment a feature/training pipeline needs.
  *
  * Spark has no native as-of join, and the naive encodings are
  * scale-killers: a range θ-join explodes (every left row × every earlier
  * right row before the per-left argmax), and a per-left correlated probe
  * is quadratic. This is the union-tag encoding instead: tag both sides,
  * union them into one frame, and carry the most recent right payload
  * forward with a running `last(ignoreNulls)` window. Cost = ONE shuffle
  * on the key + one sort within partitions — the same shape as
  * sessionization, and the minimum possible for time-ordered semantics
  * (any correct as-of must co-locate and time-order each key group).
  *
  * At 100 TB: the shuffle is keyed by the join key, so AQE handles
  * moderate skew; a single hub key still serializes into one partition's
  * sort — same as any per-key window — in which case pre-bucketing the
  * right side to (key, coarse-time) ranges is the escape hatch.
  *
  * Ties: right rows sort BEFORE left rows at equal timestamps when
  * `inclusive` (a reading at exactly t is visible to an event at t), and
  * after them otherwise. Equal-timestamp right rows within one key are
  * broken by `rightTieBreak` so results stay deterministic — callers
  * should pass a unique column (e.g. the right side's id).
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame,
               key: String, leftTs: String, rightTs: String,
               rightCols: Seq[String], inclusive: Boolean = true,
               rightTieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightSide = lit(if (inclusive) 0 else 2)
    val tie = rightTieBreak.map(col).getOrElse(lit(0L)).cast("long")
    val l = left.select(
      col(key).as("__k"), col(leftTs).cast("long").as("__t"),
      lit(1).as("__side"), lit(0L).as("__tie"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(structType(right, rightCols)).as("__r"))
    // equi-join semantics: a NULL key matches nothing. The window would
    // otherwise group all null keys into one partition and enrich
    // null-keyed left rows with null-keyed right payloads — diverging
    // from SQL (and DuckDB ASOF) NULL = NULL. Null-keyed LEFT rows stay
    // (left-join contract) and simply carry no match: with the right
    // side filtered, their partition has no payload rows.
    val r = right.where(col(key).isNotNull && col(rightTs).isNotNull).select(
      col(key).as("__k"), col(rightTs).cast("long").as("__t"),
      rightSide.as("__side"), tie.as("__tie"),
      lit(null).cast(structType(left, leftCols)).as("__l"),
      struct(rightCols.map(col): _*).as("__r"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = l.unionByName(r)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    out.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__carried.$c").as(c)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) = {
    import org.apache.spark.sql.types.StructType
    StructType(cols.map(c => df.schema(c)))
  }
}
