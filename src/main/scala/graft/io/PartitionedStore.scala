package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Hive-style partitioned parquet warehouse: directory-encoded partition
  * columns so that equality/range predicates on them prune at the FILE
  * level (listing time), before any row group is opened. This is the
  * layout a standing 100 TB event store actually ships — the companion
  * to the bucketed edge storage (GraphFormats) and the
  * cluster-partitioned IVF index (Similarity): bucketing co-locates
  * join keys, partitioning prunes scans.
  *
  * Small-file discipline: a naive partitioned write emits one file per
  * (task × live partition) — at 32 tasks × 150 partitions that is
  * already 4,800 files, and at warehouse scale it melts the namenode.
  * `write` therefore repartitions BY the partition columns first, so
  * each output partition's rows land in exactly one task → one file
  * per partition (plus Spark's `maxRecordsPerFile` as the rollover
  * valve for jumbo partitions).
  */
object PartitionedStore {

  /** Write `df` partitioned by `parts` (one parquet file per partition,
    * see small-file note above). Dynamic overwrite semantics: only the
    * partitions present in `df` are replaced on a re-run. */
  def write(df: DataFrame, path: String, parts: Seq[String],
            maxRecordsPerFile: Long = 0L): Unit =
    df.repartition(parts.map(col): _*)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(parts: _*)
      .parquet(path)

  /** Read the store back; partition-column predicates applied by the
    * caller show up as `PartitionFilters` in the scan (file pruning),
    * row predicates as `PushedFilters` (row-group pruning). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
