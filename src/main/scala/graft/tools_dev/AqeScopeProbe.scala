package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: does a thread-local cloned SQLConf actually scope AQE off
  * for planning forced inside the scope? Prints the executedPlan root
  * class under three regimes. */
object AqeScopeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def shape(tag: String): Unit = {
      val df = spark.range(1000).toDF("id").repartition(4, col("id"))
        .groupBy(col("id") % 7).count()
      println(s"$tag -> ${df.queryExecution.executedPlan.getClass.getSimpleName}")
    }
    shape("baseline(AQE on)")
    val cloned = spark.sessionState.conf.clone()
    cloned.setConfString("spark.sql.adaptive.enabled", "false")
    println("cloned.adaptiveEnabled=" + cloned.getConfString("spark.sql.adaptive.enabled"))
    org.apache.spark.sql.internal.SQLConf.withExistingConf(cloned) {
      println("inside scope SQLConf.get.adaptive=" +
        org.apache.spark.sql.internal.SQLConf.get.getConfString("spark.sql.adaptive.enabled"))
      shape("withExistingConf(cloned aqe-off)")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    shape("session conf flip")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // clone-session rebinding (CheckpointBridge.aqeOffTwin) is verified
    // by AlgosSpec's job trace + CheckpointBridgeSpec's two-thread test
    // (cloneSession/ofRows are private[sql], unreachable from here)
    spark.stop()
  }
}
