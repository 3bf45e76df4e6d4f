package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Three-point scaling probe for the super-linear-suspect kernels
  * (round-6 verdict task 5): q_graph_k4, q_item_cf, q_winnow_matches
  * grew >2× over the 10× sf0.01→sf0.1 input step. This measures the
  * NEXT decade by synthesizing a 10× corpus from sf0.1 as 10 DISJOINT
  * copies — the methodology point: disjoint copies keep the local
  * structure (degree distribution, per-order baskets, per-doc n-gram
  * profile) exactly as-is while multiplying volume exactly 10×, so the
  * kernels' true output-volume growth is exactly linear by construction
  * and any super-linear RUNTIME is the engine's, not the data's.
  *
  *  - lineitem/orders: key-offset copies (orderkey/partkey/custkey
  *    shifted per copy) — the co-purchase graph and the user–item frame
  *    become 10 disjoint isomorphic components;
  *  - documents: doc_id-offset copies with a per-copy ALPHABET ROTATION
  *    of the text (translate a..z → rotated) — within-copy 8-gram
  *    structure is isomorphic but hashes are disjoint across copies, so
  *    fingerprint df distributions match the original instead of
  *    stacking 10× (a plain text copy would collapse under the df cap
  *    and break the linearity argument).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleProbe"
  * Prints one line per (query, scale) + the decade ratio; results are
  * recorded in PLANS.md.
  */
object ScaleProbe {

  private val Targets: Seq[String] = sys.env.get("SPARK_GRAFT_PROBE")
    .map(_.split(",").toSeq)
    .getOrElse(Seq("q_graph_k4", "q_item_cf", "q_winnow_matches"))

  private def rotated(k: Int): String = {
    val a = "abcdefghijklmnopqrstuvwxyz"
    a.drop(k % 26) + a.take(k % 26)
  }

  private def buildTenX(spark: SparkSession, src: String, out: String): Unit = {
    val fs = new java.io.File(out)
    if (new java.io.File(s"$out/_DONE").exists()) return
    fs.mkdirs()
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxO = ord.agg(max(col("o_orderkey"))).first().getLong(0) + 1
    val maxP = li.agg(max(col("l_partkey"))).first().getLong(0) + 1
    val maxC = ord.agg(max(col("o_custkey"))).first().getLong(0) + 1
    val maxD = docs.agg(max(col("doc_id"))).first().getLong(0) + 1
    val copies = (0 until 10).map(lit(_))
    def rep(df: DataFrame) = df.withColumn("__k", explode(array(copies: _*)))
    rep(li)
      .withColumn("l_orderkey", col("l_orderkey") + col("__k") * maxO)
      .withColumn("l_partkey", col("l_partkey") + col("__k") * maxP)
      .drop("__k")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    rep(ord)
      .withColumn("o_orderkey", col("o_orderkey") + col("__k") * maxO)
      .withColumn("o_custkey", col("o_custkey") + col("__k") * maxC)
      .drop("__k")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    rep(docs)
      .withColumn("doc_id", col("doc_id") + col("__k") * maxD)
      .withColumn("text",
        (0 until 10).foldLeft(col("text")) { (c, k) =>
          when(col("__k") === k, translate(col("text"), alpha, rotated(k)))
            .otherwise(c)
        })
      .drop("__k")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    new java.io.File(s"$out/_DONE").createNewFile()
    ()
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tenx = sys.env.getOrElse("SPARK_GRAFT_10X_DIR", "/tmp/graft_scale10")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    buildTenX(spark, src, tenx)
    def time(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      (dt, n)
    }
    Targets.foreach { q =>
      val (t1, n1) = time(q, src)
      val (t10, n10) = time(q, tenx)
      println(f"SCALE $q%-18s 1x: $t1%7.2fs ($n1 rows)  10x: $t10%7.2fs ($n10 rows)  ratio=${t10 / t1}%5.2f")
    }
    spark.stop()
  }
}
