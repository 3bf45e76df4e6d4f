package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Typed accessors for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). All queries take a scale-factor directory so the
  * same plan runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1+
  * (bench) — and, unchanged, against a 100 TB warehouse directory.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is a no-timezone parquet timestamp (µs in the current
    * testdata). Spark 4 removed the effect of the legacy
    * `spark.sql.legacy.parquet.nanosAsLong` BIGINT read path (the conf is
    * still accepted but silently ignored), so the column surfaces as
    * TIMESTAMP_NTZ at microsecond precision. Normalize it to BIGINT
    * epoch-MICROS explicitly: integral µs keep window/session arithmetic
    * exactly reproducible by the DuckDB oracle (`epoch_us`). The
    * conversion is wall-clock NTZ arithmetic (`timestampdiff` against the
    * NTZ epoch), so it is independent of the session timezone by
    * construction — SchemaPinSpec asserts both the dtype and the
    * zone-invariance, the two canaries for the read-path drift that went
    * unseen for a whole round behind a silent catch. */
  private def eventsNormalized: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case TimestampNTZType =>
        // timestampdiff over two NTZ values is pure wall-clock arithmetic
        // — no session-timezone dependency at all (a cast through
        // TIMESTAMP would silently shift every window boundary under a
        // non-UTC session; SchemaPinSpec asserts the invariance)
        raw.withColumn("ts",
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"))
      case LongType =>
        // legacy image where nanosAsLong still worked: BIGINT epoch-nanos
        raw.withColumn("ts", expr("ts div 1000"))
      case other =>
        throw new IllegalStateException(
          s"events.ts read as unexpected type $other; expected " +
            "TIMESTAMP_NTZ (Spark 4) or BIGINT epoch-nanos (legacy read)")
    }
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events with `ts` as BIGINT epoch-MICROS (see [[eventsNormalized]]). */
  def events: DataFrame     = eventsNormalized
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
