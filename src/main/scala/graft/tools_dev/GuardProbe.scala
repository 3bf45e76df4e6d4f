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
    val spark = graft.LocalLiveness.widen(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_BUCKET_STATS: instead of the synthetic demo, measure
    // the REAL max bucket size per banding family on a testdata corpus —
    // the evidence behind DefaultMaxBucket's "no sf0.1 bucket comes
    // within two orders of magnitude" claim.
    sys.env.get("SPARK_GRAFT_BUCKET_STATS").foreach { dir =>
      val docs = graft.Tables(spark, dir).documents
      val sigs = graft.dedup.Dedup.withMinhash(docs, 8, 16)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mh = sigs.select(col("doc_id"),
          posexplode(graft.dedup.Dedup.bandHashes(col("sig"), 4, 4)).as(Seq("band", "bv")))
        .groupBy(col("band"), col("bv")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")), count(lit(1))).first()
      println(s"BUCKETSTATS minhash maxBucket=${mh.getLong(0)} buckets=${mh.getLong(1)}")
      sigs.unpersist()
      val sh = docs.select(col("doc_id"),
          graft.text.TextFunctions.simhash60(
            graft.text.TextFunctions.shingleSet(col("text"), 8)).as("s"))
        .select(posexplode(array(
          col("s").bitwiseAND(lit((1L << 30) - 1)),
          shiftright(col("s"), 30).bitwiseAND(lit((1L << 30) - 1)))).as(Seq("band", "bv")))
        .groupBy(col("band"), col("bv")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")), count(lit(1))).first()
      println(s"BUCKETSTATS simhash maxBucket=${sh.getLong(0)} buckets=${sh.getLong(1)}")
      spark.stop()
      return
    }
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
