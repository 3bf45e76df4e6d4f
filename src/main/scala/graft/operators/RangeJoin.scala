package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a range θ-join.
  *
  * Spark plans `ON p.key = i.key AND i.start <= p.t AND p.t <= i.end` as
  * an equi-join on the key followed by a filter — fine until one key has
  * many rows (the per-key cross product materializes). The bucketized
  * encoding makes the TIME dimension part of the equi-key: intervals
  * explode to the coarse-time buckets they cover, points map to their
  * single bucket, and the join is a plain equi-join on (key, bucket)
  * followed by the exact containment filter. Per-bucket work is
  * (points-in-bucket × intervals-covering-bucket) — local density, never
  * a per-key cross product.
  *
  * `bucketWidth` should be ≥ the typical interval length: each interval
  * then explodes to ≤ 2 rows (the hard bound is 1 + ceil(len/width)), and
  * the right trade is coarse-enough buckets for small fan-out but
  * fine-enough that a bucket's contents stay local. No duplicates are
  * possible: a point lives in exactly ONE bucket, so each (point,
  * interval) pair meets at most once — no DISTINCT pass needed.
  *
  * Column contract: caller renames columns so the two sides are
  * disjoint (same as [[AsOfJoin]]); output = points.* ++ intervals.*.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      key: String, t: String, start: String, end: String,
                      bucketWidth: Long): DataFrame = {
    val iv = intervals
      .withColumn("__b", explode(sequence(
        expr(s"$start div $bucketWidth"), expr(s"$end div $bucketWidth"))))
    val pt = points.withColumn("__b", expr(s"$t div $bucketWidth"))
    pt.join(iv, Seq(key, "__b"))
      .where(col(t) >= col(start) && col(t) <= col(end))
      .drop("__b")
  }
}
