package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._

/** Thread-scoping contract of the AQE-off planning inside
  * CheckpointBridge's fused helpers (round-9 verdict task 4 / ADVICE):
  * the toggle that plans fixpoint round bodies non-adaptively is a
  * cloned SQLConf in the planner's thread-local, NOT a session-global
  * conf flip — so a concurrent query on the same session must keep
  * planning adaptively, the session conf must never read "false", and
  * two overlapping fixpoints must not clobber each other (the old
  * read-flip-restore implementation could race two restores and leave
  * AQE permanently disabled for the session).
  */
class CheckpointBridgeSpec extends SparkSpec {

  test("withAqeOff is thread-scoped: concurrent queries stay adaptive, " +
    "session conf never flips, overlapping fused checkpoints are correct") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val pool = Executors.newFixedThreadPool(3)
    val start = new CountDownLatch(1)
    val stop = new AtomicBoolean(false)
    val confFlips = new AtomicInteger(0)
    val nonAdaptive = new AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // two writers run OVERLAPPING fused checkpoints (each plans its
    // round body AQE-off internally); a reader interleaves adaptive
    // queries and watches the session conf the whole time
    def fused(tag: String): Runnable = () => {
      start.await()
      try (1 to 8).foreach { _ =>
        val df = spark.range(200).toDF("id")
          .withColumn("act", col("id") % 2 === 0)
        val (ck, cnt) = org.apache.spark.sql.graft.CheckpointBridge
          .localCheckpointHashCount(df, "id", 4, "act")
        if (cnt != 100L) failures.add(s"$tag: fused count $cnt != 100")
        org.apache.spark.sql.graft.CheckpointBridge.free(ck)
      } catch { case e: Throwable => failures.add(s"$tag: ${e.getMessage}") }
    }
    val fA = pool.submit(fused("A"))
    val fB = pool.submit(fused("B"))
    val fC = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try while (!stop.get()) {
          if (spark.conf.get("spark.sql.adaptive.enabled") != "true")
            confFlips.incrementAndGet()
          val q = spark.range(100).toDF("id")
            .groupBy((col("id") % 7).as("k")).count()
          if (q.collect().length != 7) failures.add("reader: wrong result")
          q.queryExecution.executedPlan match {
            case _: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => ()
            case other => nonAdaptive.incrementAndGet(); ()
          }
          if (spark.conf.get("spark.sql.adaptive.enabled") != "true")
            confFlips.incrementAndGet()
        } catch { case e: Throwable => failures.add(s"reader: ${e.getMessage}") }
      }
    })
    start.countDown()
    fA.get(180, TimeUnit.SECONDS)
    fB.get(180, TimeUnit.SECONDS)
    stop.set(true)
    fC.get(60, TimeUnit.SECONDS)
    pool.shutdown()
    assert(failures.isEmpty, failures.toArray.mkString("; "))
    assert(confFlips.get() == 0,
      s"session-global AQE conf read 'false' ${confFlips.get()} times — the toggle leaked")
    assert(nonAdaptive.get() == 0,
      s"${nonAdaptive.get()} concurrent queries planned non-adaptively — the toggle leaked")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }
}
