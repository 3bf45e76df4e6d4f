package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.Algos

/** Planted-hub SKEW probe (round-13 verdict task 1).
  *
  * Every ScaleProbe decade row multiplies VOLUME (disjoint isomorphic
  * copies) but not SKEW — yet "a full shuffle on a skewed key" is the
  * canonical 100 TB scale-killer, and the reference built striping
  * precisely for hub-driven message blow-up
  * (giraph-block-app .../library/striping/StripingUtils.java:42 —
  * hash-splitting a piece to bound peak per-worker message volume).
  * This probe grafts a single hub vertex carrying ~SKEW_PCT% of |E|
  * onto the 10× customer–supplier graph and measures the
  * frontier/fixpoint kernels on the BASE vs the HUB frame under
  * identical resources, reporting per run:
  *
  *   wall s, Spark jobs, gc_ms  (the bench adjudication channels), and
  *   task-level balance: max task ms, mean task ms, max/mean ratio,
  *   and max-task share of wall (a run is "collapsed by one straggler"
  *   when one task's duration approaches the whole wall).
  *
  * Construction: hub id = max vertex id + 1; targets = the full distinct
  * vertex set, replicated ceil(target/|V|) times and truncated to
  * `target = |E|·pct/100` rows (a hot KEY's row share is what shuffle
  * skew is about, so parallel edges are the honest filler when
  * |V| < target — they multiply the hub's message volume exactly like
  * the reference's striping scenario). Edges are written to parquet
  * once and every kernel reads the same files, so base-vs-hub is
  * scan-to-scan. Both frames are SYMMETRIC (hub→v and v→hub), giving
  * the hub both the high in-degree (stressing the groupBy(id) message
  * combine) and the high out-degree (stressing the frontier⋈edges
  * join's hash(src) partition).
  *
  * Mitigation posture being measured: Spark's own two levers are ON —
  * partial (map-side) aggregation makes the hub's message combine
  * receive ≤ one partial row per shuffle partition regardless of
  * fan-in, and AQE skew-join splitting re-plans oversized join
  * partitions at runtime. If a kernel still collapses (max-task share
  * ≈ 1), the engine-side escape is [[graft.graph.Skew.saltedJoin]] on
  * the hot key — wired here only if the measurement demands it, per
  * the round-14 rule that mitigations ship with their measurements.
  *
  * The LSH banding family gets the analogous treatment via
  * [[graft.dedup.Dedup.lshCandidates]]: a planted duplicate group of
  * ~10% of the corpus (one degenerate bucket per band) measured
  * unguarded (maxBucket = ∞: the all-pairs blow-up, quadratic in the
  * group) vs star-guarded (maxBucket = 1000: O(B) candidates) — the
  * hot-BUCKET twin of the hot-vertex scenario above.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt -batch "runMain graft.SkewProbe"           # or tools/run.sh
  * Knobs: SPARK_GRAFT_SKEW_PCT (default 10), SPARK_GRAFT_SKEW_KERNELS
  * (csv filter), SPARK_GRAFT_SKEW_DOCS=0 (skip the banding probe),
  * SPARK_GRAFT_SKEW_DIR (work dir). Results land in PLANS.md's
  * skew-decade table.
  */
object SkewProbe {

  private val taskCnt = new java.util.concurrent.atomic.AtomicLong(0)
  private val taskSum = new java.util.concurrent.atomic.AtomicLong(0)
  private val taskMax = new java.util.concurrent.atomic.AtomicLong(0)
  private val jobCnt = new java.util.concurrent.atomic.AtomicInteger(0)

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val pct = sys.env.getOrElse("SPARK_GRAFT_SKEW_PCT", "10").toInt
    val corpus = sys.env.getOrElse("SPARK_GRAFT_10X_DIR", "/tmp/graft_scale10")
    val work = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR", "/tmp/graft_skew10")
    // disk scratch on purpose (probe-scale spills; see LocalScratch scope)
    val spark = LocalLiveness.widen(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCnt.incrementAndGet(); ()
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        taskCnt.incrementAndGet(); taskSum.addAndGet(d)
        taskMax.updateAndGet(m => math.max(m, d)); ()
      }
    })
    ScaleProbe.buildTenX(spark, src, corpus, nCopies = scale)
    buildEdges(spark, src, corpus, work, pct)

    import scala.jdk.CollectionConverters._
    def gcNow(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    // min-of-N passes per (kernel, variant), one printed line per pass:
    // this box swings individual runs ±3× at identical job counts
    // (hypervisor steal; both probe runs showed a 60-85 s straggler land
    // on a DIFFERENT variant), and the per-pass lines let the table take
    // the min while keeping the raw evidence
    val passes = sys.env.getOrElse("SPARK_GRAFT_SKEW_PASSES", "2").toInt
    def measure(label: String, variant: String)(body: => Long): Unit =
      (1 to passes).foreach { p =>
        jobCnt.set(0); taskCnt.set(0); taskSum.set(0); taskMax.set(0)
        val g0 = gcNow()
        val t0 = System.nanoTime()
        val rows = body
        val wall = (System.nanoTime() - t0) / 1e9
        val gc = gcNow() - g0
        org.apache.spark.sql.graft.CheckpointBridge.drainListeners(spark)
        val (n, sum, mx) = (taskCnt.get(), taskSum.get(), taskMax.get())
        val mean = if (n == 0) 0.0 else sum.toDouble / n
        val ratio = if (mean == 0) 0.0 else mx / mean
        val share = if (wall == 0) 0.0 else mx / (wall * 1000)
        println(f"SKEW $label%-14s $variant%-7s p$p wall=$wall%8.2fs jobs=${jobCnt.get()}%4d gc=${gc}%6dms tasks=$n%7d maxTask=${mx}%7dms meanTask=$mean%9.1fms max/mean=$ratio%7.1f maxShare=$share%5.3f rows=$rows")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
      }

    val kernels: Seq[(String, DataFrame => Long)] = Seq(
      "pagerank" -> (e => Algos.pagerank(e.select("src", "dst"), iterations = 5).count()),
      "wcc" -> (e => Algos.wcc(e.select("src", "dst")).count()),
      "sssp" -> { e =>
        val sourceV = e.agg(min(col("src"))).first().getLong(0)
        Algos.sssp(e.select("src", "dst", "w"), sourceV).count()
      },
      "lpa" -> (e => Algos.lpa(e.select("src", "dst"), rounds = 4).count()),
      "bowtie" -> (e => Algos.bowtie(e.select("src", "dst")).count()))
    val only = sys.env.get("SPARK_GRAFT_SKEW_KERNELS").map(_.split(",").toSet)
    kernels.filter { case (k, _) => only.forall(_.contains(k)) }.foreach { case (k, fn) =>
      // untimed per-kernel warmup on the 1× graph: base always runs
      // before hub, so without this the FIRST timed run of each kernel
      // absorbs its codepaths' JIT (measured: pagerank base read 165.8 s
      // cold vs 23.0 s warm at identical job counts) and every base-vs-
      // hub wall comparison reads backwards
      try { fn(spark.read.parquet(s"$work/warm_edges.parquet")); () }
      catch { case _: Exception => () }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      Seq("base" -> s"$work/base_edges.parquet",
          "hub" -> s"$work/hub_edges.parquet").foreach { case (variant, path) =>
        try measure(k, variant)(fn(spark.read.parquet(path)))
        catch {
          case e: Exception =>
            println(s"SKEW $k $variant FAILED: ${e.getMessage}")
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        }
      }
    }

    if (sys.env.getOrElse("SPARK_GRAFT_SKEW_DOCS", "1") == "1"
        && new java.io.File(s"$corpus/documents.parquet").exists()) {
      // planted corpus goes to parquet, not a checkpoint: measure()'s
      // between-run hygiene unpersists every persistent RDD, which
      // DESTROYS a lineage-truncated localCheckpoint shared across
      // variants (first probe run died on exactly this). SCATTERED
      // (repartition 64): the first construction wrote the 15 MB corpus
      // as few files, the scan coalesced it into ~1 partition, and ONE
      // task computed all 55k signatures (~57 s straggler in BOTH
      // variants) — a small-corpus artifact (100 TB scans carry
      // thousands of row groups), and real boilerplate dups are
      // scattered through a corpus anyway.
      val docsPath = s"$work/skew_docs_v2.parquet"
      val sigsPath = s"$work/skew_sigs_v2.parquet"
      if (!new java.io.File(s"$sigsPath/_SUCCESS").exists()) {
        val base = spark.read.parquet(s"$corpus/documents.parquet")
          .select(col("doc_id"), col("text"))
        val hot = base.count() / pct
        val maxId = base.agg(max(col("doc_id"))).first().getLong(0)
        // one degenerate near-dup group: the lexicographically-first text
        // replicated `hot` times under fresh ids — every band hashes the
        // whole group into one bucket
        val seedTxt = base.orderBy(col("doc_id")).select(col("text")).first().getString(0)
        val planted = spark.range(hot)
          .select((col("id") + maxId + 1).as("doc_id"), lit(seedTxt).as("text"))
        base.unionByName(planted).repartition(64, col("doc_id"))
          .write.mode("overwrite").parquet(docsPath)
        // pre-sign UNTIMED so lsh_band measures the banded self-join
        // alone (the skewed-join question), not the per-doc kernel
        graft.dedup.Dedup.withMinhash(spark.read.parquet(docsPath),
            shingleLen = 8, numHashes = 16)
          .write.mode("overwrite").parquet(sigsPath)
      }
      val docs = spark.read.parquet(docsPath)
      println(s"SKEWDOCS corpus=${docs.count()} (planted hot bucket = ${100 / pct}% of docs)")
      // the per-doc signature kernel on the scattered corpus, for the
      // record (CPU-dense map work — partitions, no shuffle, no skew)
      try measure("lsh_sign", "scatter") {
        // sum of a signature element's length, not count(1): count lets
        // column pruning drop the signature kernel entirely (the Bench
        // warmup idiom; sig elements are md5 strings)
        graft.dedup.Dedup.withMinhash(docs, shingleLen = 8, numHashes = 16)
          .agg(sum(length(element_at(col("sig"), 1)))).first().getLong(0)
      } catch {
        case e: Exception => println(s"SKEW lsh_sign FAILED: ${e.getMessage}")
      }
      Seq("allpair" -> Int.MaxValue, "star" -> 1000).foreach { case (variant, cap) =>
        try measure("lsh_band", variant) {
          graft.dedup.Dedup.lshCandidates(spark.read.parquet(sigsPath),
            bands = 4, rowsPerBand = 4, maxBucket = cap).count()
        } catch {
          case e: Exception =>
            println(s"SKEW lsh_band $variant FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }

  /** Write base (plain 10× custSuppSym) and hub (base ∪ hub star) edge
    * frames to parquet once; a marker keyed by pct skips rebuilds. */
  private def buildEdges(spark: SparkSession, src: String, corpus: String,
                         work: String, pct: Int): Unit = {
    // v2: adds the 1× warmup edge frame
    val marker = new java.io.File(s"$work/_DONE_v2_pct$pct")
    if (marker.exists()) return
    new java.io.File(work).mkdirs()
    val base = TestGraphs.custSuppSym(Tables(spark, corpus))
      .select(col("src"), col("dst"), col("w"))
    base.write.mode("overwrite").parquet(s"$work/base_edges.parquet")
    // small 1× graph for the per-kernel untimed JIT warmup
    TestGraphs.custSuppSym(Tables(spark, src))
      .select(col("src"), col("dst"), col("w"))
      .write.mode("overwrite").parquet(s"$work/warm_edges.parquet")
    val b = spark.read.parquet(s"$work/base_edges.parquet")
    val nE = b.count()
    val verts = b.select(col("src").as("v")).distinct().localCheckpoint()
    val nV = verts.count()
    val target = math.max(1L, nE * pct / 100)
    val mult = ((target + nV - 1) / nV).toInt
    val hubId = b.agg(greatest(max(col("src")), max(col("dst")))).first().getLong(0) + 1
    val half = verts
      .withColumn("__m", explode(array((0 until mult).map(lit): _*)))
      .limit(target.toInt)
      .select(lit(hubId).as("src"), col("v").as("dst"), lit(1L).as("w"))
    val hub = b.unionByName(half)
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    hub.write.mode("overwrite").parquet(s"$work/hub_edges.parquet")
    val hubDeg = 2L * math.min(target, mult.toLong * nV)
    println(s"SKEWBUILD |V|=$nV |E|sym=$nE hub=$hubId hubDeg=$hubDeg " +
      f"(targeted $pct%d%% of |E| per direction, multiplicity $mult)")
    marker.createNewFile()
    ()
  }
}
