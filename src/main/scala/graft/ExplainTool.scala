package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of named queries (comma-separated in
  * args(0)) against args(1) (default sf0.01) — used for the per-round
  * plan audits recorded in PLANS.md. */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      println(s"========== $q")
      println(Queries.all(q)(spark, dir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
