package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time q_dedup_recall_audit's two halves separately (exact
  * Jaccard truth at t=70 on the half corpus vs the MinHash-LSH candidate
  * side), twice each, to attribute the audit's bench cost. */
object AuditProbe {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tt(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { p =>
        val t0 = System.nanoTime(); val n = f
        println(f"AUDIT $label pass$p ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    val docs = graft.Tables(spark, src).documents.filter(col("doc_id") % 2 === 0)
    tt("truth70") {
      graft.dedup.Dedup.jaccardJoin(
        docs.select(col("doc_id"),
          graft.text.TextFunctions.shingleSet(col("text"), 8).as("items")), 70).count()
    }
    tt("lsh") {
      graft.dedup.Dedup.lshCandidates(
        graft.dedup.Dedup.withMinhash(docs, shingleLen = 8, numHashes = 16), 4, 4).count()
    }
    spark.stop()
  }
}
