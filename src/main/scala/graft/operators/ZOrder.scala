package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) clustering for multi-column scan pruning.
  *
  * Parquet skips files/row-groups by per-column min-max ranges, which
  * only helps when rows are clustered on the filtered column. Sorting
  * on (a, b) clusters a but scatters b; interleaving the bits of both
  * into one z-value and range-sorting on IT clusters BOTH columns at
  * once, so predicates on either column (or both) touch a small subset
  * of files — the standard lakehouse layout technique (Delta/Iceberg
  * OPTIMIZE ZORDER) built from plain Spark: a codegen'd bit-interleave
  * Column + repartitionByRange + sortWithinPartitions. No UDF, no
  * custom writer.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i. Pure
    * bit-arithmetic expression tree — whole-stage codegen compiles it
    * to shifts and ors. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))

  /** DuckDB twin of [[zValue]]. */
  def zValueSql(a: String, b: String, bits: Int = 21): String =
    s"""CAST(list_sum(list_transform(range(0, $bits), i ->
       |((($a >> i) & 1) << (2 * i + 1)) + ((($b >> i) & 1) << (2 * i))
       |)) AS BIGINT)""".stripMargin.replace('\n', ' ')

  /** Rewrite `df` into `numFiles` z-clustered files on (aCol, bCol):
    * range-partition on the z-value (balanced file sizes via sampled
    * range bounds — the exact Delta OPTIMIZE ZORDER shape), sort within
    * partitions, drop the helper column at write. */
  def clusterBy(df: DataFrame, aCol: String, bCol: String,
                numFiles: Int): DataFrame = {
    df.withColumn("__z", zValue(col(aCol), col(bCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
