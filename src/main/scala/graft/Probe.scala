package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler: times the stages inside a composite query so
  * optimization targets the piece that actually costs (bench reports only
  * whole-query wall time). Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Probe"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    val docs = Tables(spark, sfDir).documents
    // warm up the JVM/parquet read path
    time("warmup:docs.count")(docs.count())
    val pairs = time("minhashDupPairs")(
      graft.dedup.Dedup.minhashDupPairs(docs).select(col("a"), col("b")))
    time("pairs.count")(println("pairs=" + pairs.count()))
    val clusters = time("wcc(dupClusters)")(graft.dedup.Dedup.dupClusters(pairs))
    time("clusters.count")(println("clusters=" + clusters.count()))
    spark.stop()
  }
}
