package graft.tools_dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: trace every Spark job fired by a pagerankConverged run with
  * its call site, to attribute the per-round job bill exactly. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = graft.graph.Prep.makeSymmetric(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)).toDF("src", "dst"))
    // warm up once so codegen/setup jobs don't pollute
    graft.graph.Algos.pagerankConverged(e, maxIters = 1, tol = 0.0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val names = js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")
        println(s"JOB ${js.jobId} stages=${js.stageInfos.size}  $names")
      }
    })
    println("=== maxIters=2 run ===")
    graft.graph.Algos.pagerankConverged(e, maxIters = 2, tol = 0.0)
    org.apache.spark.sql.graft.CheckpointBridge.drainListeners(spark)
    spark.stop()
  }
}
