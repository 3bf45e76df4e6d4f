package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: demonstrate the hot-bucket guard at a scale where the
  * unguarded self-join is infeasible. Synthesizes `SPARK_GRAFT_COPIES`
  * (default 200k) byte-identical boilerplate documents — every LSH band
  * maps ALL of them into one (band, bv) bucket, the degenerate shape the
  * 100 TB reality produces from site-template boilerplate — plus a small
  * healthy corpus, then runs the guarded candidate pass. Unguarded, the
  * bucket would emit copies²/2 pre-distinct pairs (2·10¹⁰ at 200k — an
  * hour-class shuffle); guarded it emits copies−1 star pairs. Prints
  * wall + candidate count for PLANS.md. */
object GuardProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val boiler = "subscribe to our newsletter for updates terms apply " +
      "all rights reserved contact us at example dot com do not reply"
    val docs = spark.range(copies)
      .select((col("id") + 1000000L).as("doc_id"), lit(boiler).as("text"))
      .unionByName(spark.range(500).select(col("id").as("doc_id"),
        md5(col("id").cast("string")).as("text")))
    val sigs = graft.dedup.Dedup.withMinhash(docs, shingleLen = 8, numHashes = 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t0 = System.nanoTime()
    val n = graft.dedup.Dedup.lshCandidates(sigs, bands = 4, rowsPerBand = 4).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"GUARD copies=$copies candidates=$n wall=$dt%6.2fs " +
      f"(unguarded would be ~${copies * (copies - 1) / 2} pre-distinct pairs)")
    spark.stop()
  }
}
