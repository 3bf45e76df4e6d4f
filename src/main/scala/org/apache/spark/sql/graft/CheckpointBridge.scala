package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions.col

/** Release the storage behind a superseded frame, whichever way it was
  * materialized. `Dataset.unpersist` only clears CacheManager entries
  * (`.persist`/`.cache`); a `localCheckpoint()`-ed frame is backed by a
  * raw persistent RDD inside a [[LogicalRDD]] leaf that the CacheManager
  * never sees — verified empirically: after `df.localCheckpoint();
  * df.unpersist(true)`, `sc.getPersistentRDDs` still holds the blocks.
  * Iterative loops that keep only the latest checkpoint must free the
  * superseded one at the RDD level or blocks pile up until the
  * ContextCleaner happens to collect them.
  *
  * MUST only be called on frames that are never read again, and only on
  * frames that are DIRECT `localCheckpoint()` products (their single
  * plan leaf is their own RDD): a localCheckpoint has truncated lineage,
  * so freed blocks are unrecoverable — and calling this on a frame whose
  * plan merely *contains* someone else's checkpoint leaf would free that
  * caller-owned data too.
  */
object CheckpointBridge {

  /** Rebind `df` onto a session that plans with AQE OFF. The fused-count
    * checkpoints exist to make each fixpoint
    * round cost ONE driver job; under AQE the same round pays one job
    * per query-stage materialization (measured 7 jobs/round on the
    * pagerankConverged body: sums shuffle, two join stages, the
    * repartition, the dangling broadcast, then the count — round-8
    * verdict). AQE buys nothing inside these round bodies — every join
    * input is a declared-partitioning LogicalRDD with measured stats,
    * so there are no runtime re-plan decisions left to make, while each
    * extra stage job is a driver scheduling round-trip that a
    * 1000-executor cluster pays in O(100 ms) units per round.
    *
    * SESSION-SCOPED (round-10, was a session-global conf flip): the
    * input frame's logical plan is rebound onto a fresh CLONED session
    * whose conf (cloned too) has AQE off — physical planning reads the
    * BOUND session's conf, so only the helper's own planning+execution
    * is non-adaptive. (A thread-local `SQLConf.withExistingConf` clone
    * does NOT work: measured on 4.1.2, executedPlan stays
    * AdaptiveSparkPlanExec even though SQLConf.get reads false inside
    * the scope — planning resolves the session conf, not the
    * thread-local.) A concurrent query on the caller's session plans
    * adaptively as configured, the caller's conf is never touched, and
    * overlapping fixpoints each get their own clone — nothing to
    * restore, nothing to race. cloneSession() copies SessionState
    * (conf, catalog incl. temp views, registry) and shares the
    * SparkContext, so accumulators, cached blocks, and the returned
    * declared-LogicalRDD frames (always built against the CALLER's
    * session) behave exactly as before. Per-round clone cost is driver
    * metadata only — measured: 50 clones add ONE listener to the shared
    * LiveListenerBus total (the execution-listener bus is shared, not
    * per-session), so a 1000-round fixpoint leaks nothing. Pinned by
    * the two-thread test in CheckpointBridgeSpec. */
  private def aqeOffTwin(df: DataFrame): DataFrame = {
    val parent = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val clone = parent.cloneSession()
    clone.conf.set("spark.sql.adaptive.enabled", "false")
    org.apache.spark.sql.classic.Dataset.ofRows(clone, df.queryExecution.logical)
  }

  def free(df: Dataset[_]): Unit = {
    df.unpersist(false)
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** localCheckpoint that KEEPS its hash partitioning visible to the
    * optimizer. Under AQE, `Dataset.localCheckpoint` captures the
    * adaptive plan's pre-execution `outputPartitioning` — which is
    * Unknown — so every downstream keyed join/aggregation reshuffles the
    * checkpointed frame even though its rows are already correctly
    * hash-placed. For an iterative engine that is one extra vertex-frame
    * shuffle per superstep, per algorithm.
    *
    * This forces the exact layout first (`repartition(n, key)` — the
    * explicit-count form, which AQE never coalesces, so the materialized
    * RDD is bit-exactly pmod(murmur3(key), n) placed), checkpoints, then
    * rebuilds the LogicalRDD leaf declaring that HashPartitioning. The
    * declaration is sound because the RDD partitions ARE the shuffle
    * output partitions of that exact partitioning — nothing is assumed.
    *
    * Deliberately planned ADAPTIVELY (not wrapped in withAqeOff, unlike
    * the fused helpers and localCheckpointStats): this checkpoint's
    * callers feed it BIG frames — one-shot edge prep (symmetrize/dedup
    * pipelines whose shuffles genuinely benefit from AQE coalescing and
    * skew splits at TB scale) and big-frame round bodies. Loops that
    * want the one-job-per-round driver bill use the fused
    * localCheckpointHashCount/DeltaWhere variants, which are AQE-off. */
  def localCheckpointHash(df: DataFrame, key: String, n: Int): DataFrame = {
    val ck = df.repartition(n, col(key)).localCheckpoint()
    ck.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val attr = l.output.find(_.name == key).getOrElse(
          throw new IllegalArgumentException(s"no column $key in ${l.output}"))
        // Declare the frame's MEASURED size too (the blocks are already
        // materialized — this is metadata, not a job). A bare LogicalRDD
        // reports defaultSizeInBytes (= "huge"), which forbids broadcast
        // planning forever; and because the declared partitioning removes
        // every exchange, AQE never gets a shuffle stage to re-measure, so
        // without this a small iterated frame is stuck in sort-merge
        // joins — measured 1.4–3.2× on sf0.1 WCC vs the round-3 plans
        // where AQE runtime-broadcast the vertex frame. With real stats
        // the planner broadcasts small frames statically and keeps the
        // exchange-free co-partitioned join for frames that are genuinely
        // big — the right plan at both ends of the scale.
        val info = ck.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
        val stats = info.map(i =>
          org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes = BigInt(i.memSize + i.diskSize).max(1)))
        val declared = new LogicalRDD(
          l.output, l.rdd, HashPartitioning(Seq(attr), n),
          l.outputOrdering, l.isStreaming, l.getStream)(
          ck.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          stats, None)
        org.apache.spark.sql.classic.Dataset.ofRows(
          ck.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          declared)
      case _ => ck // unexpected plan shape: fall back to the plain checkpoint
    }
  }

  /** [[localCheckpointHash]] that ALSO counts the rows whose `boolCol`
    * is true DURING the materialization job — fusing the Pregel loop's
    * per-superstep (checkpoint, active-count) job pair into one job, i.e.
    * one driver barrier per superstep instead of two. The accumulator
    * fires inside the single materializing action; a task retry can only
    * ever over-count rows that exist, so a true zero (termination) can
    * never be reported as non-zero spuriously in the other direction —
    * the loop may at worst run one redundant round, never stop early.
    *
    * Row copies mirror `Dataset.checkpoint`'s own implementation: the
    * physical rows are reused UnsafeRows and MUST be copied before
    * caching. */
  def localCheckpointHashCount(df: DataFrame, key: String, n: Int,
                               boolCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val base = aqeOffTwin(df).repartition(n, col(key))
    val output = base.queryExecution.analyzed.output
    val ord = output.indexWhere(_.name == boolCol)
    require(ord >= 0, s"no column $boolCol in $output")
    val keyAttr = output.find(_.name == key).getOrElse(
      throw new IllegalArgumentException(s"no column $key in $output"))
    val acc = spark.sparkContext.longAccumulator("graft.activeCount")
    val rdd = base.queryExecution.toRdd.mapPartitions({ it =>
      it.map { row =>
        if (!row.isNullAt(ord) && row.getBoolean(ord)) acc.add(1L)
        row.copy()
      }
    }, preservesPartitioning = true)
    rdd.localCheckpoint()
    rdd.count() // the ONE materializing job; acc is complete after it
    val stats = spark.sparkContext.getRDDStorageInfo.find(_.id == rdd.id)
      .map(i => org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = BigInt(i.memSize + i.diskSize).max(1)))
    val declared = new LogicalRDD(
      output, rdd, HashPartitioning(Seq(keyAttr), n),
      Nil, false, None)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      stats, None)
    (org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      declared), acc.value)
  }

  /** [[localCheckpointHashCount]] for an arbitrary predicate: the
    * predicate is appended as a synthetic boolean column for the fused
    * count and dropped again on the way out (the Project on top of the
    * declared LogicalRDD preserves its partitioning). */
  def localCheckpointHashCountWhere(df: DataFrame, key: String, n: Int,
                                    pred: org.apache.spark.sql.Column): (DataFrame, Long) = {
    require(!df.columns.contains("__graft_cnt"),
      "input already has a __graft_cnt column: withColumn would replace it " +
        "and the fused count would read caller data")
    val (ck, cnt) = localCheckpointHashCount(
      df.withColumn("__graft_cnt", pred), key, n, "__graft_cnt")
    (ck.drop("__graft_cnt"), cnt)
  }

  /** Max-of-doubles accumulator (Spark ships sum-only DoubleAccumulator).
    * max is IDEMPOTENT, so task retries cannot perturb it at all. */
  private final class MaxDoubleAccumulator
      extends org.apache.spark.util.AccumulatorV2[java.lang.Double, java.lang.Double] {
    private var _v = Double.NegativeInfinity
    override def isZero: Boolean = _v == Double.NegativeInfinity
    override def copy(): MaxDoubleAccumulator = {
      val c = new MaxDoubleAccumulator; c._v = _v; c
    }
    override def reset(): Unit = _v = Double.NegativeInfinity
    override def add(v: java.lang.Double): Unit = if (v > _v) _v = v
    override def merge(
        o: org.apache.spark.util.AccumulatorV2[java.lang.Double, java.lang.Double]): Unit =
      o match { case m: MaxDoubleAccumulator => if (m._v > _v) _v = m._v; case _ => () }
    override def value: java.lang.Double = _v
  }

  /** [[localCheckpointHashCount]] for a DOUBLE convergence metric: the
    * SUM and MAX of `metric` over all rows accumulate during the one
    * materializing job, so a delta-halted loop (pagerankConverged) pays
    * ONE materializing action per round instead of checkpoint +
    * delta-agg. Measured round bill (AlgosSpec job trace): exactly one
    * action job; any broadcast-exchange builds inside the round's plan
    * (the dangling-mass scalar always; other join builds only when the
    * frames are small enough that stats elect broadcast) run as
    * additional async future jobs, whose count is scale-dependent by
    * design. Returns (frame without the metric column, sum, max); max
    * is Double.NegativeInfinity on an empty frame.
    *
    * Same one-sided-error contract as the fused counts: a task retry can
    * only re-ADD non-negative metric values (callers pass |Δ|-shaped
    * metrics), so the reported delta is ≥ the true delta — the loop can
    * at worst run extra rounds, never halt early on a wrong small delta.
    * The delta is LOOP CONTROL only; it must never become query result
    * data (ADVICE r7). */
  def localCheckpointHashDeltaWhere(df: DataFrame, key: String, n: Int,
                                    metric: org.apache.spark.sql.Column)
      : (DataFrame, Double, Double) = {
    require(!df.columns.contains("__graft_delta"),
      "input already has a __graft_delta column")
    val spark = df.sparkSession
    val base = aqeOffTwin(df).withColumn("__graft_delta", metric.cast("double"))
      .repartition(n, col(key))
    val output = base.queryExecution.analyzed.output
    val ord = output.indexWhere(_.name == "__graft_delta")
    val keyAttr = output.find(_.name == key).getOrElse(
      throw new IllegalArgumentException(s"no column $key in $output"))
    val sumAcc = spark.sparkContext.doubleAccumulator("graft.deltaSum")
    val maxAcc = new MaxDoubleAccumulator
    spark.sparkContext.register(maxAcc, "graft.deltaMax")
    val rdd = base.queryExecution.toRdd.mapPartitions({ it =>
      it.map { row =>
        if (!row.isNullAt(ord)) {
          val d = row.getDouble(ord); sumAcc.add(d); maxAcc.add(d)
        }
        row.copy()
      }
    }, preservesPartitioning = true)
    rdd.localCheckpoint()
    rdd.count() // the ONE materializing job; both accumulators complete
    val stats = spark.sparkContext.getRDDStorageInfo.find(_.id == rdd.id)
      .map(i => org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = BigInt(i.memSize + i.diskSize).max(1)))
    val declared = new LogicalRDD(
      output, rdd, HashPartitioning(Seq(keyAttr), n),
      Nil, false, None)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      stats, None)
    (org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      declared).drop("__graft_delta"), sumAcc.value, maxAcc.value)
  }

  /** [[localCheckpointStats]] with a fused predicate count (same
    * accumulator-on-the-materializing-action contract as
    * [[localCheckpointHashCount]], no partitioning claim and no
    * repartition pass). */
  def localCheckpointStatsCountWhere(df: DataFrame,
                                     pred: org.apache.spark.sql.Column): (DataFrame, Long) = {
    require(!df.columns.contains("__graft_cnt"),
      "input already has a __graft_cnt column: withColumn would replace it " +
        "in place, so ord would read the wrong column and drop() would " +
        "remove caller data")
    val spark = df.sparkSession
    val flagged = aqeOffTwin(df).withColumn("__graft_cnt", pred)
    val output = flagged.queryExecution.analyzed.output
    val ord = output.size - 1
    val acc = spark.sparkContext.longAccumulator("graft.statsCount")
    val rdd = flagged.queryExecution.toRdd.mapPartitions({ it =>
      it.map { row =>
        if (!row.isNullAt(ord) && row.getBoolean(ord)) acc.add(1L)
        row.copy()
      }
    }, preservesPartitioning = true)
    rdd.localCheckpoint()
    rdd.count()
    val stats = spark.sparkContext.getRDDStorageInfo.find(_.id == rdd.id)
      .map(i => org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = BigInt(i.memSize + i.diskSize).max(1)))
    val declared = new LogicalRDD(
      output, rdd,
      org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(rdd.getNumPartitions),
      Nil, false, None)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      stats, None)
    (org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      declared).drop("__graft_cnt"), acc.value)
  }

  /** Plain localCheckpoint that declares the frame's MEASURED size (no
    * partitioning claim — the input is checkpointed as-laid-out, no
    * repartition pass). For iterated frames SMALL enough that their
    * joins should broadcast, this is the better checkpoint: the declared
    * stats let the planner pick broadcast statically (a bare checkpoint
    * reports "huge" and blocks it), and skipping the forced repartition
    * saves one full exchange of the frame per round.
    *
    * Planned AQE-OFF like the fused helpers (ADVICE r9): the loops that
    * call this per round (WCC's vertex frame, tagged-BFS frontiers,
    * leaf-peel) otherwise pay one driver job per AQE query-stage
    * materialization — the exact bill the fused helpers eliminated. For
    * those round bodies the toggle is free: the frames are
    * broadcast-small, and the measured stats make the static planner
    * pick that broadcast — AQE's runtime conversions and skew splits
    * have nothing left to add. Known trade, accepted deliberately: a
    * few ONE-SHOT call sites feed this data-sized frames (scc's round-0
    * remainder, kTruss's pair frame, the matchings' window+self-join
    * over the live edge set) and forgo AQE's post-shuffle coalescing
    * there — their internal shuffles hash on high-cardinality keys
    * (vertex/edge ids) with no skew-join site AQE could split, and the
    * per-round job-bill win across the loop family dominates a one-time
    * partition-count nicety. A checkpoint of a big frame that DOES
    * contain a skewable join belongs on [[localCheckpointHash]] (stays
    * adaptive) instead. */
  def localCheckpointStats(df: DataFrame): DataFrame = {
    // checkpoint via the AQE-off twin; the returned frame is rebound to
    // the CALLER's session (a clone-bound result would silently plan
    // every downstream consumer non-adaptively too)
    val parent = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ck = aqeOffTwin(df).localCheckpoint()
    ck.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val stats = parent.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .map(i => org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes = BigInt(i.memSize + i.diskSize).max(1)))
        val declared = new LogicalRDD(
          l.output, l.rdd, l.outputPartitioning,
          l.outputOrdering, l.isStreaming, l.getStream)(
          parent, stats, None)
        org.apache.spark.sql.classic.Dataset.ofRows(parent, declared)
      case _ =>
        org.apache.spark.sql.classic.Dataset.ofRows(
          parent, ck.queryExecution.logical)
    }
  }

  /** The materialized byte size of a checkpointed frame (mem + disk
    * blocks) — driver metadata, not a job. -1 when the frame's leaf is
    * not a materialized RDD. */
  def sizeOf(df: Dataset[_]): Long =
    df.queryExecution.analyzed.collectLeaves().collectFirst {
      case l: LogicalRDD =>
        df.sparkSession.sparkContext.getRDDStorageInfo.find(_.id == l.rdd.id)
          .map(i => i.memSize + i.diskSize).getOrElse(-1L)
    }.getOrElse(-1L)

  /** Block until the listener bus has delivered all queued events —
    * needed by anything reading SparkListener-fed counters (job counts
    * are delivered asynchronously; a sleep is a race). private[spark],
    * hence exposed through this bridge package. */
  def drainListeners(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
