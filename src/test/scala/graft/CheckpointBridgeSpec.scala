package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._

/** Scoping contract of the AQE-off planning inside CheckpointBridge's
  * fused helpers (round-9 verdict task 4 / ADVICE): the toggle that
  * plans fixpoint round bodies non-adaptively is a CLONED SESSION the
  * input frame is rebound onto (`aqeOffTwin` — NOT a session-global
  * conf flip, and NOT a thread-local SQLConf, which measurably does not
  * scope physical planning on 4.1.2; see aqeOffTwin's scaladoc). So a
  * concurrent query on the caller's session must keep planning
  * adaptively, the caller's conf must never read "false", and two
  * overlapping fixpoints must not clobber each other (the old
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
    try {
      fA.get(180, TimeUnit.SECONDS)
      fB.get(180, TimeUnit.SECONDS)
    } finally {
      // a writer timeout/failure must not leave the reader spinning on a
      // non-daemon pool thread (suite hang instead of a clean failure)
      stop.set(true)
    }
    try fC.get(60, TimeUnit.SECONDS) finally pool.shutdownNow()
    assert(failures.isEmpty, failures.toArray.mkString("; "))
    assert(confFlips.get() == 0,
      s"session-global AQE conf read 'false' ${confFlips.get()} times — the toggle leaked")
    assert(nonAdaptive.get() == 0,
      s"${nonAdaptive.get()} concurrent queries planned non-adaptively — the toggle leaked")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }
}
