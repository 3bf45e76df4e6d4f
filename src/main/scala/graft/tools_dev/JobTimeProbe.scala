package graft.tools_dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: run declared queries with a per-JOB wall/task/stage trace —
  * the attribution step between a query's total and its round trace.
  * Usage: tools/jrun.sh graft.tools_dev.JobTimeProbe q_graph_ktruss
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS). */
object JobTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.LocalLiveness.widen(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.details.linesIterator
          .find(l => l.contains("graft") && !l.contains("tools_dev"))
          .getOrElse("")).getOrElse("")
        starts.put(js.jobId,
          (System.nanoTime(),
            js.stageInfos.map(_.numTasks).sum + "t/" + js.stageInfos.size + "s " + site.trim))
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, info) =>
          println(f"  JOB ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2fs $info")
        }
      }
    })
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      org.apache.spark.sql.graft.CheckpointBridge.drainListeners(spark)
      println(f"TOTAL $name ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
