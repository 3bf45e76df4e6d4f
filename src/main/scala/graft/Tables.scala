package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed accessors for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). All queries take a scale-factor directory so the
  * same plan runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1+
  * (bench) — and, unchanged, against a 100 TB warehouse directory.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet timestamp[ns], which Spark only reads with the
    * nanosAsLong legacy flag — so `ts` surfaces as BIGINT epoch-nanos.
    * That is deliberate: integral nanos make window/session arithmetic
    * exactly reproducible by the DuckDB oracle (epoch_ns). */
  private def eventsRaw: DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    t("events")
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = eventsRaw
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
