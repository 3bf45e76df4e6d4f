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

  /** Small-file compaction for selected partitions: rewrite the
    * partitions matched by `partitionPredicate` (a predicate over
    * partition COLUMNS only, so the input scan file-prunes) back to one
    * file each via dynamic partition overwrite. The ingest side of a
    * warehouse accretes a file per micro-batch/append; periodic
    * compaction is what keeps scan task counts sane — at 100 TB this
    * runs per-partition-group as a maintenance job, never over the
    * whole store. Untouched partitions' files are left byte-identical
    * (dynamic overwrite only replaces partitions present in the
    * rewrite input). */
  def compact(spark: SparkSession, path: String, parts: Seq[String],
              partitionPredicate: org.apache.spark.sql.Column): Unit = {
    // localCheckpoint materializes the rewrite input BEFORE the
    // overwrite touches the directory (Spark otherwise rejects — or
    // worse, races — a write into a path its own plan still reads)
    val pruned = read(spark, path).filter(partitionPredicate).localCheckpoint()
    write(pruned, path, parts)
  }

  /** Retention: drop whole partitions by deleting their DIRECTORIES —
    * no row scan at all (the file-level delete a partition layout
    * exists to make possible). `keep` maps a partition-directory
    * relative path like `day=3/type=click` (order as written) to
    * whether it survives. Hive-style `col=value` dirs are parsed for
    * the caller: `keep` receives (column, value) pairs. */
  def dropPartitions(path: String,
                     keep: Map[String, String] => Boolean): Int = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path)
    // leaf partition dirs = dirs containing data files, encoded k=v per level
    val all = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) && p != root)
      .toSeq
    val leaves = all.filter { d =>
      java.nio.file.Files.list(d).iterator().asScala
        .exists(f => f.toString.endsWith(".parquet"))
    }
    var dropped = 0
    leaves.foreach { d =>
      val kvs = root.relativize(d).iterator().asScala.map(_.toString)
        .filter(_.contains("=")).map { seg =>
          val Array(k, v) = seg.split("=", 2); k -> v
        }.toMap
      if (!keep(kvs)) {
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        dropped += 1
      }
    }
    dropped
  }
}
