package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection helper: dump the formatted physical plan of declared
  * queries (pushdown / broadcast / codegen audit — the "is this the plan
  * I'd want at 100 TB" loop). Usage:
  *   sbt "runMain graft.Explain [sfDir] [query ...]"
  *
  * Env knobs (optimization-round plan capture):
  *   SPARK_GRAFT_EXPLAIN_CPUS  core/shuffle-partition count (default 4;
  *                             use 32 to match the bench session layout)
  *   SPARK_GRAFT_EXPLAIN_DIR   also write each plan to
  *                             $DIR/<query>_<suffix>.txt
  *   SPARK_GRAFT_EXPLAIN_TAG   file suffix (default "before")
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_agg", "q05_nation_rev", "q06_filter_sum", "q_graph_degrees")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_CPUS", "4")
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    val tag = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_TAG", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(txt)
      outDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"${n}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
