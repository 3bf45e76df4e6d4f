package graft.tools_dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-round wall/job/stage attribution for greedyColoring on
  * the declared q_graph_coloring input (symmetrized eventChain). The
  * round loop is replicated here with timers so the production code
  * stays clean; any structural change to Algos.greedyColoring must be
  * mirrored or this probe's numbers stop meaning anything. */
object ColoringProbe {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val verbose = sys.env.contains("SPARK_GRAFT_COLORING_JOBS")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) jobStart.put(js.jobId,
          (System.nanoTime(), js.stageInfos.map(_.numTasks).sum + "t/" + js.stageInfos.size + "s"))
        ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        if (verbose) Option(jobStart.get(je.jobId)).foreach { case (t0, info) =>
          println(f"  JOB ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2fs $info")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    })
    def tt[A](lbl: String)(f: => A): A = {
      org.apache.spark.sql.graft.CheckpointBridge.drainListeners(spark)
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val a = f
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.CheckpointBridge.drainListeners(spark)
      println(f"TRACE $lbl%-18s ${dt}%7.2fs jobs=${jobs.get()}%3d stages=${stages.get()}%3d")
      a
    }
    // warmup pass: JIT + codegen for the whole loop shape
    tt("warmup-full") {
      graft.graph.Algos.greedyColoring(graft.graph.Prep.makeSymmetric(
        graft.TestGraphs.eventChain(graft.Tables(spark, sfDir)))).count()
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    tt("full-query") {
      graft.graph.Algos.greedyColoring(graft.graph.Prep.makeSymmetric(
        graft.TestGraphs.eventChain(graft.Tables(spark, sfDir)))).count()
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    // round-1 dissection: replicate the loop body piecewise with counts
    locally {
      val bridge = org.apache.spark.sql.graft.CheckpointBridge
      val np = spark.sessionState.conf.numShufflePartitions
      val sym = graft.graph.Prep.makeSymmetric(
        graft.TestGraphs.eventChain(graft.Tables(spark, sfDir)))
      val e = tt("e-ckpt") { bridge.localCheckpointHash(sym.select("src", "dst"), "src", np) }
      val verts = tt("verts-ckpt") { bridge.localCheckpointHash(
        e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
          .select(col("id"),
            conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10).cast("long").as("p"),
            lit(null).cast("long").as("color")), "id", np) }
      val st = verts.select(col("id").as("dst"), col("p").as("np"), col("color").as("nc"))
      val nbrMax = e.join(st, Seq("dst")).filter(col("nc").isNull)
        .groupBy(col("src").as("id")).agg(max(struct(col("np"), col("dst"))).as("mx"))
      tt("nbrMax-count") { nbrMax.count() }
      val winners = verts.filter(col("color").isNull)
        .join(nbrMax, Seq("id"), "left")
        .filter(col("mx").isNull || struct(col("p").as("np"), col("id").as("dst")) > col("mx"))
        .select(col("id"))
      tt("winners-count") { winners.count() }
      val used = winners.join(e, winners("id") === e("src"))
        .join(st, Seq("dst")).filter(col("nc").isNotNull)
        .groupBy(winners("id")).agg(array_sort(collect_set(col("nc"))).as("cols"))
      tt("used-count") { used.count() }
      val assigned = winners.join(used, Seq("id"), "left")
        .select(col("id"), aggregate(coalesce(col("cols"), array().cast("array<long>")),
          lit(0L), (acc, c) => org.apache.spark.sql.functions.when(c === acc, acc + 1L).otherwise(acc)).as("newc"))
      tt("assigned-count") { assigned.count() }
      val nxt = verts.join(assigned, Seq("id"), "left")
        .select(col("id"), col("p"), coalesce(col("color"), col("newc")).as("color"))
      val r = tt("fused-ckpt-round1") {
        bridge.localCheckpointHashCountWhere(nxt, "id", np, col("color").isNull)
      }
      println("uncolored after r1 = " + r._2)
      if (sys.env.contains("SPARK_GRAFT_COLORING_EXPLAIN"))
        println(nxt.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
