package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.EventStreams.{Event, Sessionize}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, sec: Long, user: Long) =
    Event(id, new Timestamp(sec * 1000L), user, "click", 1.0)

  test("streaming sessionization matches the batch gap rule") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = Sessionize.run(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    // user 1: two events 10s apart (1 session), then one 40min later (2nd)
    input.addData(ev(1, 0, 1), ev(2, 10, 1), ev(3, 2500, 1), ev(4, 0, 2))
    query.processAllAvailable()
    val got = spark.table("sessions").as[EventStreams.UserSessions]
      .collect().map(u => u.user_id -> (u.sessions, u.events_cnt)).toMap
    assert(got(1L) == ((2L, 3L)))
    assert(got(2L) == ((1L, 1L)))
    query.stop()
  }

  test("streaming funnel emits one completion per user, matching batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    def tev(id: Long, sec: Long, user: Long, ty: String) =
      Event(id, new Timestamp(sec * 1000L), user, ty, 1.0)
    val input = MemoryStream[Event]
    val query = EventStreams.Funnel.run(input.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    // user 1 completes across batches; user 2's purchase precedes its
    // click (incomplete); user 3's click precedes signup then a valid one
    input.addData(
      tev(1, 100, 1, "signup"), tev(2, 150, 1, "click"),
      tev(10, 100, 2, "signup"), tev(11, 120, 2, "purchase"),
      tev(20, 50, 3, "click"), tev(21, 80, 3, "signup"))
    query.processAllAvailable()
    input.addData(
      tev(3, 300, 1, "purchase"),
      tev(22, 90, 3, "click"), tev(23, 95, 3, "purchase"),
      tev(4, 400, 1, "purchase")) // second purchase: must NOT re-emit
    query.processAllAvailable()
    val got = spark.table("funnel").as[EventStreams.FunnelHit]
      .collect().map(h => h.user_id -> ((h.t_signup_ms, h.t_click_ms, h.t_purchase_ms)))
      .toMap
    assert(spark.table("funnel").count() == 2) // exactly one row per completed user
    assert(got(1L) == ((100000L, 150000L, 300000L)))
    assert(got(3L) == ((80000L, 90000L, 95000L)))
    assert(!got.contains(2L))
    query.stop()
  }

  test("upsert sink rewrites only touched buckets and keeps newest per user") {
    implicit val sqlCtx = spark.sqlContext
    def uev(id: Long, sec: Long, user: Long, v: Double) =
      Event(id, new Timestamp(sec * 1000L), user, "purchase", v)
    val path = java.nio.file.Files.createTempDirectory("upsert").toString
    val ckpt = java.nio.file.Files.createTempDirectory("upsert_ck").toString
    val input = MemoryStream[Event]
    val query = EventStreams.UpsertSink.run(input.toDS(), path, numBuckets = 4,
      checkpoint = ckpt)
    // batch 1: users 0..3 land in buckets 0..3
    input.addData(uev(1, 100, 0, 1.0), uev(2, 100, 1, 2.0),
      uev(3, 100, 2, 3.0), uev(4, 100, 3, 4.0), uev(5, 200, 0, 9.0))
    query.processAllAvailable()
    def state(): Map[Long, (Long, Double)] =
      spark.read.parquet(path).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("event_id"), r.getAs[Double]("value")))).toMap
    assert(state() == Map(0L -> ((5L, 9.0)), 1L -> ((2L, 2.0)),
      2L -> ((3L, 3.0)), 3L -> ((4L, 4.0))))
    // snapshot mtimes of bucket 2's files (untouched by batch 2)
    def bucketFiles(b: Int): Map[String, Long] = {
      val d = new java.io.File(s"$path/bucket=$b")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = bucketFiles(2)
    // batch 2: update user 0 (bucket 0), new user 5 (bucket 1); an OLDER
    // event for user 3 must NOT displace the stored newer row
    input.addData(uev(6, 300, 0, 7.0), uev(7, 100, 5, 5.0), uev(8, 50, 3, 0.5))
    query.processAllAvailable()
    assert(state() == Map(0L -> ((6L, 7.0)), 1L -> ((2L, 2.0)),
      2L -> ((3L, 3.0)), 3L -> ((4L, 4.0)), 5L -> ((7L, 5.0))))
    assert(bucketFiles(2) == before, "untouched bucket was rewritten")
    query.stop()
  }

  test("streaming incremental dedup probes the stored index per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    // standing corpus signed ONCE into a stored index (batch side)
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog", "s1"),
      (11L, "completely different content entirely here now", "s1")
    ).toDF("doc_id", "text", "source")
    val path = java.nio.file.Files.createTempDirectory("sigidx_stream").toString
    graft.dedup.Dedup.writeSignatureIndex(corpus, path)
    val input = MemoryStream[(Long, String)]
    val stream = input.toDS().toDF("doc_id", "text")
    val query = EventStreams.dedupAgainstIndex(stream, path)
      .writeStream.format("memory").queryName("incdedup")
      .outputMode("append").start()
    // batch 1: a near-dup of indexed doc 10 + a novel doc
    input.addData((1L, "the quick brown fox jumps over the lazy cat"),
                  (2L, "nothing like anything stored in the index at all"))
    query.processAllAvailable()
    // batch 2: an exact copy of indexed doc 11 — cross-batch increment
    input.addData((3L, "completely different content entirely here now"))
    query.processAllAvailable()
    val got = spark.table("incdedup").select("new_id", "idx_id", "jac_e6")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 10L), (3L, 11L)))
    assert(got(1)._3 == 1000000L) // exact copy → jaccard 1
    // parity: the batch incremental path reports the same pairs
    val batch = graft.dedup.Dedup.incrementalDupPairs(
      Seq((1L, "the quick brown fox jumps over the lazy cat", "s1"),
          (2L, "nothing like anything stored in the index at all", "s1"),
          (3L, "completely different content entirely here now", "s1"))
        .toDF("doc_id", "text", "source"), path)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(batch == got)
    query.stop()
  }

  test("streaming sliding windows put each event in width/slide windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.slidingCounts(input.toDS().toDF())
      .writeStream.format("memory").queryName("sliding")
      .outputMode("update").start()
    // one event at t=3600s: 1h windows sliding 15min → exactly the 4
    // windows with start ∈ (0, 3600] step 900
    input.addData(ev(1, 3600, 1))
    query.processAllAvailable()
    val starts = spark.table("sliding")
      .select(col("window.start").cast("long")).as[Long].collect().toSet
    assert(starts == Set(900L, 1800L, 2700L, 3600L))
    query.stop()
  }

  test("streaming dedup keeps first arrival and drops watermark-window dups") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.dedupStream(input.toDS().toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    // same-batch dup (id 1) and cross-batch dup (id 2) both collapse
    input.addData(ev(1, 100, 1), ev(1, 100, 1), ev(2, 200, 1))
    query.processAllAvailable()
    input.addData(ev(2, 260, 1), ev(3, 300, 2))
    query.processAllAvailable()
    val ids = spark.table("dedup").select("event_id").as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L))
    query.stop()
  }

  test("file source to parquet sink processes directory drops end-to-end") {
    val base = java.nio.file.Files.createTempDirectory("stream").toString
    val (inDir, outDir, ckDir) = (s"$base/in", s"$base/out", s"$base/ck")
    new java.io.File(inDir).mkdirs()
    // first drop lands before the query starts, later drops advance the
    // watermark (2h) past the first hour window so append mode emits it
    Seq(ev(1, 100, 1), ev(2, 200, 1)).toDS()
      .write.parquet(s"$inDir/drop1")
    val query = EventStreams.streamDirectoryToParquet(spark, s"$inDir/*", outDir, ckDir)
    query.processAllAvailable()
    Seq(ev(3, 4 * 3600, 2)).toDS().write.parquet(s"$inDir/drop2")
    query.processAllAvailable() // watermark after this batch: 4h − 2h = 2h
    Seq(ev(4, 5 * 3600, 2)).toDS().write.parquet(s"$inDir/drop3")
    query.processAllAvailable() // this batch EMITS windows ending ≤ 2h
    query.stop()
    val out = spark.read.parquet(outDir)
      .select(col("window.start").cast("long"), col("cnt")).as[(Long, Long)]
      .collect().toMap
    assert(out(0L) == 2L) // hour-0 window finalized with both first events
    assert(new java.io.File(s"$ckDir/offsets").list().length >= 3) // ≥3 batches
  }

  test("stream-stream interval join attributes purchases to in-window clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val query = EventStreams.attributionJoin(
        clicks.toDS().toDF(), purchases.toDS().toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    // purchase at t=4000s: click at 3900 (in window), click at 100 (1h+
    // earlier → out), click at 4100 (after purchase → out), other user out
    clicks.addData(ev(1, 100, 1), ev(2, 3900, 1), ev(3, 4100, 1), ev(4, 3900, 2))
    purchases.addData(ev(10, 4000, 1))
    query.processAllAvailable()
    val got = spark.table("attrib")
      .select(col("purchase_id"), col("click_id")).as[(Long, Long)]
      .collect().toSet
    assert(got == Set((10L, 2L)))
    // batch parity: same frames through a static range join
    val cB = Seq(ev(1, 100, 1), ev(2, 3900, 1), ev(3, 4100, 1), ev(4, 3900, 2)).toDF()
    val pB = Seq(ev(10, 4000, 1)).toDF()
    val batch = EventStreams.attributionJoin(cB, pB)
      .select(col("purchase_id"), col("click_id")).as[(Long, Long)].collect().toSet
    assert(batch == got)
    query.stop()
  }

  test("left-outer stream-stream join emits unconverted clicks after watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val query = EventStreams.attributionJoinLeftOuter(
        clicks.toDS().toDF(), purchases.toDS().toDF())
      .writeStream.format("memory").queryName("attrib_lo")
      .outputMode("append").start()
    // user 1's click converts at +600s; user 2's click never converts
    clicks.addData(ev(1, 100, 1), ev(2, 200, 2))
    purchases.addData(ev(10, 700, 1))
    query.processAllAvailable()
    // feeder batches advance the global watermark past 200 + 1h + 2h so
    // the join state for click 2 is evicted and its null row emitted
    // (eviction happens in the batch AFTER the watermark update — hence
    // two feeder rounds)
    clicks.addData(ev(90, 20000, 9)); purchases.addData(ev(91, 20000, 9))
    query.processAllAvailable()
    clicks.addData(ev(92, 30000, 9)); purchases.addData(ev(93, 30000, 9))
    query.processAllAvailable()
    val got = spark.table("attrib_lo")
      .filter(col("click_ts") < to_timestamp(lit("1970-01-01 01:00:00")))
      .select(col("click_id"), col("purchase_id")).as[(Long, Option[Long])]
      .collect().toSet
    assert(got == Set((1L, Some(10L)), (2L, None)))
    // batch parity on the closed region: the same frames as a bounded
    // left-outer range join agree row-for-row
    val cB = Seq(ev(1, 100, 1), ev(2, 200, 2)).toDF()
    val pB = Seq(ev(10, 700, 1)).toDF()
    val batch = EventStreams.attributionJoinLeftOuter(cB, pB)
      .select(col("click_id"), col("purchase_id")).as[(Long, Option[Long])]
      .collect().toSet
    assert(batch == got)
    query.stop()
  }

  test("file-sink query restarts from its checkpoint without duplicating output") {
    val base = java.nio.file.Files.createTempDirectory("restart").toString
    val (inDir, outDir, ckDir) = (s"$base/in", s"$base/out", s"$base/ck")
    new java.io.File(inDir).mkdirs()
    Seq(ev(1, 100, 1), ev(2, 200, 1)).toDS().write.parquet(s"$inDir/d1")
    val q1 = EventStreams.streamDirectoryToParquet(spark, s"$inDir/*", outDir, ckDir)
    q1.processAllAvailable()
    q1.stop() // simulated failure: the run dies, the checkpoint survives
    // a NEW query on the SAME checkpoint resumes offsets + window state
    Seq(ev(3, 4 * 3600, 2)).toDS().write.parquet(s"$inDir/d2")
    val q2 = EventStreams.streamDirectoryToParquet(spark, s"$inDir/*", outDir, ckDir)
    q2.processAllAvailable()
    Seq(ev(4, 5 * 3600, 2)).toDS().write.parquet(s"$inDir/d3")
    q2.processAllAvailable() // watermark passes hour-0 → append emits it
    q2.stop()
    val out = spark.read.parquet(outDir)
      .select(col("window.start").cast("long"), col("cnt")).as[(Long, Long)]
      .collect()
    // hour-0 window appears EXACTLY once with both pre-restart events —
    // state restored, nothing reprocessed, nothing dropped
    assert(out.count(_._1 == 0L) == 1)
    assert(out.toMap.apply(0L) == 2L)
  }

  test("funnel FSM state survives a checkpointed kill+restart") {
    // the streaming analog of PregelSpec's kill+resume: the
    // flatMapGroupsWithState FSM must recover its per-user stage vector
    // from the SS checkpoint, not just its source offsets
    implicit val sqlCtx = spark.sqlContext
    def tev(id: Long, sec: Long, user: Long, ty: String) =
      Event(id, new Timestamp(sec * 1000L), user, ty, 1.0)
    val base = java.nio.file.Files.createTempDirectory("funnel_restart").toString
    val (outDir, ckDir) = (s"$base/out", s"$base/ck")
    val input = MemoryStream[Event]
    // foreachBatch sink: checkpoint-recoverable (the memory sink is not,
    // in update mode), and the parquet output is the restart evidence
    def start() = EventStreams.Funnel.run(input.toDS())
      .writeStream
      .option("checkpointLocation", ckDir)
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[EventStreams.FunnelHit], _: Long) =>
        df.write.mode("append").parquet(outDir)
      }
      .start()
    val q1 = start()
    // pre-kill: user 1 is two stages in (signup+click), user 2 one stage
    input.addData(tev(1, 100, 1, "signup"), tev(2, 150, 1, "click"),
      tev(10, 120, 2, "signup"))
    q1.processAllAvailable()
    q1.stop() // simulated failure — state lives only in the checkpoint now
    val q2 = start()
    // post-restart: the purchases complete ONLY if the pre-kill stage
    // timestamps were recovered from state-store snapshots
    input.addData(tev(3, 300, 1, "purchase"),
      tev(11, 180, 2, "click"), tev(12, 200, 2, "purchase"))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(outDir).as[EventStreams.FunnelHit]
      .collect().map(h => h.user_id -> ((h.t_signup_ms, h.t_click_ms, h.t_purchase_ms)))
      .toMap
    assert(got.size == 2)
    assert(got(1L) == ((100000L, 150000L, 300000L))) // signup+click are PRE-kill
    assert(got(2L) == ((120000L, 180000L, 200000L))) // signup is PRE-kill
  }

  test("streaming tumbling over the REAL events table equals the batch buckets") {
    // Round-5 lesson: every streaming spec used synthetic fixtures, so a
    // Spark-image type shift in the real table went unseen. This parity
    // runs the actual testdata through the streaming path: Tables.events
    // (BIGINT epoch-µs) → µs-precise Timestamps → tumblingCounts, then
    // compares every (hour, type) bucket against the batch aggregation
    // that q_tumbling uses.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    implicit val sqlCtx = spark.sqlContext
    val t = graft.Tables(spark, dir)
    def usTs(us: Long): Timestamp = {
      val ts = new Timestamp(us / 1000000L * 1000L)
      ts.setNanos(((us % 1000000L) * 1000L).toInt)
      ts
    }
    val rows = t.events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
      .map(r => EventStreams.Event(r._1, usTs(r._2), r._3, r._4, r._5))
    val input = MemoryStream[EventStreams.Event]
    val query = EventStreams.tumblingCounts(input.toDS().toDF())
      .writeStream.format("memory").queryName("tumbling_real")
      .outputMode("update").start()
    input.addData(rows.toIndexedSeq: _*) // one batch → one update per bucket
    query.processAllAvailable()
    val streamed = spark.table("tumbling_real")
      .selectExpr("CAST(window.start AS LONG) div 3600 AS hour_idx",
        "event_type", "cnt", "sum_value")
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val batch = t.events
      .groupBy(expr("ts div 3600000000").as("hour_idx"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
      .as[(Long, String, Long, Double)].collect()
    assert(batch.nonEmpty && batch.length == streamed.size)
    batch.foreach { case (h, ty, cnt, sv) =>
      val (scnt, ssv) = streamed((h, ty))
      assert(scnt == cnt, s"cnt mismatch at ($h,$ty)")
      // double sums differ only by reorder ulps between the two engines
      assert(math.abs(ssv - sv) <= 1e-6 * (1 + math.abs(sv)),
        s"sum mismatch at ($h,$ty): $ssv vs $sv")
    }
    query.stop()
  }

  test("streaming exact DAU dedups users within each day window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.dailyActiveUsers(input.toDS().toDF())
      .writeStream.format("memory").queryName("dau")
      .outputMode("update").start()
    // day 0: user 1 twice + user 2 once → dau 2; day 1: user 1 once → 1
    input.addData(ev(1, 100, 1), ev(2, 200, 1), ev(3, 4000, 2),
      ev(4, 90000, 1))
    query.processAllAvailable()
    val got = spark.table("dau")
      .select(col("window.start").cast("long"), col("dau")).as[(Long, Long)]
      .collect().toMap
    assert(got(0L) == 2L && got(86400L) == 1L)
    query.stop()
  }

  test("streaming anomaly alerts flag the planted volume spike on day close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.AnomalyAlerts.run(input.toDS())
      .writeStream.format("memory").queryName("anomaly")
      .outputMode("update").start()
    def day(d: Long, n: Int, base: Long): Seq[Event] =
      (0 until n).map(i => ev(base + i, d * 86400 + i, 1))
    // days 0-3 steady at 10, day 4 spikes to 50, day 5 opens (closes day 4)
    input.addData(day(0, 10, 0) ++ day(1, 10, 100) ++ day(2, 10, 200) ++
      day(3, 10, 300) ++ day(4, 50, 400) ++ day(5, 1, 900): _*)
    query.processAllAvailable()
    val got = spark.table("anomaly")
      .select(col("day"), col("cnt"), col("is_anomaly"))
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    query.stop()
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(got.take(4).forall(_._3 == 0))         // steady days pass
    assert(got.last == ((4L, 50L, 1)))            // spike flagged at close
  }

  test("streaming EWMA over the REAL events equals the batch fold") {
    // the stateful twin of q_ewma_daily: feed the actual testdata in
    // event-time order, close every day, and compare each emitted
    // (type, day, v, ewma) against the batch recurrence
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    implicit val sqlCtx = spark.sqlContext
    val t = graft.Tables(spark, dir)
    def usTs(us: Long): Timestamp = {
      val ts = new Timestamp(us / 1000000L * 1000L)
      ts.setNanos(((us % 1000000L) * 1000L).toInt)
      ts
    }
    val rows = t.events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
      .sortBy(r => (r._2, r._1))
      .map(r => EventStreams.Event(r._1, usTs(r._2), r._3, r._4, r._5))
    val input = MemoryStream[EventStreams.Event]
    val query = EventStreams.EwmaDaily.run(input.toDS())
      .writeStream.format("memory").queryName("ewma_real")
      .outputMode("update").start()
    input.addData(rows.toIndexedSeq: _*)
    query.processAllAvailable()
    val streamed = spark.table("ewma_real")
      .select(col("event_type"), col("day"), col("v"), col("ewma"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val batch = graft.Queries.all("q_ewma_daily")(spark, dir)
      .select(col("event_type"), col("day"), col("v"), col("ewma"))
      .as[(String, Long, Long, Long)].collect()
    // the stream's LAST day per type never closes — every closed day
    // must match the batch fold exactly
    assert(streamed.nonEmpty)
    val lastDay = batch.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    batch.filter(r => r._2 < lastDay(r._1)).foreach { case (ty, d, v, ew) =>
      val (sv, sew) = streamed((ty, d))
      assert(sv == v, s"day-sum mismatch at ($ty,$d)")
      assert(sew == ew, s"ewma mismatch at ($ty,$d)")
    }
    query.stop()
  }

  test("streaming tumbling counts equal the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.tumblingCounts(input.toDS().toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("update").start()
    input.addData(ev(1, 100, 1), ev(2, 200, 1), ev(3, 4000, 2))
    query.processAllAvailable()
    val got = spark.table("tumbling")
      .select(col("window.start").cast("long"), col("cnt")).as[(Long, Long)]
      .collect().toMap
    assert(got(0L) == 2L && got(3600L) == 1L)
    query.stop()
  }

  test("streaming hll registers finalize to the batch estimate per window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.hllWindowed(input.toDS().toDF(), "user_id")
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("update").start()
    // window 0: users 1..40 (some twice — duplicates must not move
    // registers); window 1: users 100..110
    val w0 = (1L to 40L).map(u => ev(u, u % 1800, u)) ++
      (1L to 10L).map(u => ev(100 + u, 1800 + u, u))
    val w1 = (100L to 110L).map(u => ev(200 + u, 3600 + u, u))
    input.addData(w0 ++ w1: _*)
    query.processAllAvailable()
    // update mode re-emits rows as they grow: reduce to the final
    // register value (max — the agg itself) per (window, bucket)
    val regs = spark.table("hllregs")
      .select(col("window.start").cast("long").as("g"), col("b"), col("r"))
      .groupBy("g", "b").agg(max("r").as("r"))
    val streamed = graft.functions.Sketches.hllFinalize(regs, "g")
      .select(col("g"), col("z_scaled"), col("hll_est_e2"))
      .as[(Long, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    // batch twin over the same rows, grouped by the same hour key
    val batchDf = (w0 ++ w1).toSeq.toDF()
      .select((expr("cast(ts as long) div 3600") * 3600L).as("g"), col("user_id"))
    val batch = graft.functions.Sketches.hllDistinct(batchDf, "user_id", "g")
      .select(col("g"), col("z_scaled"), col("hll_est_e2"))
      .as[(Long, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(streamed == batch)
    assert(streamed.contains(0L) && streamed.contains(3600L))
    query.stop()
  }

  test("ingest gate dedups by content and stamps the Gopher panel, matching batch flags") {
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox jumps over a lazy dog near the river today"
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDS().toDF("doc_id", "ts", "text")
    val query = EventStreams.ingestGate(docs)
      .writeStream.format("memory").queryName("ingest_gate")
      .outputMode("append").start()
    input.addData(
      (1L, new Timestamp(100000L), good),
      (2L, new Timestamp(101000L), good),          // same-batch content dup
      (3L, new Timestamp(102000L), "too short"))   // fails n_words rule
    query.processAllAvailable()
    input.addData(
      (4L, new Timestamp(200000L), good),          // cross-batch content dup
      (5L, new Timestamp(201000L), "zz yy xx ww vv uu tt ss rr qq pp oo"))
    query.processAllAvailable()
    val out = spark.table("ingest_gate")
      .select("doc_id", "pass").as[(Long, Long)].collect().toMap
    // dups 2 and 4 dropped; 1 passes; 3 fails length; 5 fails stopwords
    assert(out == Map(1L -> 1L, 3L -> 0L, 5L -> 0L))
    // flag parity with the batch Gopher panel on the surviving rows
    val batch = graft.pipeline.Corpus.gopherRules(
        Seq((1L, good), (3L, "too short"),
          (5L, "zz yy xx ww vv uu tt ss rr qq pp oo")).toDF("doc_id", "text"))
      .select("doc_id", "pass").as[(Long, Long)].collect().toMap
    assert(out == batch)
    query.stop()
  }

  // --- state-size boundedness under the watermark horizon -------------
  // (round-8 verdict task 5 / round-7 task 6): the scale contract of
  // every stateful streaming operator here is that state is
  // O(watermark horizon of events), not O(stream). These drive many
  // multiples of the horizon through the query and assert, via
  // StreamingQueryProgress.stateOperators.numRowsTotal, that retained
  // state stays bounded by a couple of horizons while the total fed
  // grows unbounded.

  private def lastStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.reverseIterator
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .getOrElse(-1L)

  test("attribution join state stays bounded by the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val query = EventStreams.attributionJoin(
        clicks.toDS().toDF(), purchases.toDS().toDF())
      .writeStream.format("memory").queryName("attrib_state")
      .outputMode("append").start()
    // 8 waves, 4 h apart in event time; join horizon = 1 h window +
    // 2 h watermark = 3 h < 4 h, so each wave's buffered rows are
    // evictable before the next wave lands
    val waveClicks = 25
    val wavePurch = 5
    val waves = 8
    (0 until waves).foreach { w =>
      val base = w * 14400L
      clicks.addData((0 until waveClicks).map(i =>
        ev(w * 1000L + i, base + i, w * 100L + i)): _*)
      purchases.addData((0 until wavePurch).map(i =>
        ev(w * 1000L + 500 + i, base + 60 + i, w * 100L + i)): _*)
      query.processAllAvailable()
    }
    val fed = waves * (waveClicks + wavePurch)
    val st = lastStateRows(query)
    assert(st >= 0, "no stateOperators progress reported")
    // eviction lags one batch behind the watermark update, so up to two
    // waves may be retained — but never the whole feed
    assert(st <= 3L * (waveClicks + wavePurch),
      s"join state $st rows after feeding $fed — not bounded by the horizon")
    query.stop()
  }

  test("exact-DAU chained dedup+agg state stays bounded by the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.dailyActiveUsers(input.toDS().toDF())
      .writeStream.format("memory").queryName("dau_state")
      .outputMode("update").start()
    // 10 days, 20 users/day, 2 events per user-day; horizon = 25 h, so
    // only ~2 days of (user, day) dedup rows + ~2 day windows may live
    val days = 10
    val users = 20
    (0 until days).foreach { d =>
      val base = d * 86400L
      input.addData((0 until users).flatMap(u => Seq(
        ev(d * 10000L + u * 2L, base + u * 60L, u.toLong),
        ev(d * 10000L + u * 2L + 1L, base + u * 60L + 30L, u.toLong))): _*)
      query.processAllAvailable()
    }
    val fedUserDays = days * users
    val st = lastStateRows(query)
    assert(st >= 0, "no stateOperators progress reported")
    assert(st <= 3L * users + 3L,
      s"DAU state $st rows after $fedUserDays distinct user-days — not bounded")
    query.stop()
  }
}
