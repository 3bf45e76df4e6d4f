package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Options for the BSP superstep loop.
  *
  * @param maxSupersteps   hard cap, mirrors giraph's max-superstep config
  * @param checkpointEvery truncate lineage every N supersteps. Iterative
  *                        DataFrame plans grow per iteration; without eager
  *                        checkpointing the optimizer re-analyzes an
  *                        exponentially growing tree (SURVEY §7.4 risk #1).
  * @param storageLevel    MEMORY_AND_DISK replaces the reference's whole
  *                        out-of-core engine (giraph-core ooc/, ~7k LoC):
  *                        Spark spills partitions natively.
  */
final case class PregelOptions(
    maxSupersteps: Int = 50,
    checkpointEvery: Int = 6,
    storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    /** When set, every `checkpointEvery` supersteps write a *reliable*,
      * restartable snapshot (`<dir>/step_<N>` parquet) instead of only
      * `localCheckpoint`-ing (which truncates lineage but dies with the
      * app). Fault tolerance per the reference's checkpoint machinery,
      * BspServiceWorker.java:1340-1460. */
    checkpointDir: Option[String] = None,
    /** With `checkpointDir`: resume from the latest `step_<N>` snapshot
      * instead of `vertices` — the reference's restart-on-failure,
      * BspServiceMaster.java:1225 (`restartFromCheckpoint`) /
      * :1118 (prepare checkpoint restart). No snapshot present → a
      * normal from-scratch run. */
    resume: Boolean = false,
    /** Superstep-output hook: called with (vertexFrame, superstep) after
      * each superstep — the reference's write-during-computation modes
      * (io/superstep_output, GiraphConstants DO_OUTPUT_DURING_COMPUTATION).
      * The frame is valid ONLY for the duration of the call: its backing
      * blocks are freed once the next superstep materializes (write/
      * aggregate inside the hook; do not retain the frame). */
    onSuperstep: (DataFrame, Int) => Unit = (_, _) => (),
    /** Pre-superstep hook (reference Computation.preSuperstep,
      * CORE/graph/Computation.java:78-84): called with the CURRENT vertex
      * frame and the superstep number before that superstep's messages
      * fly — symmetric to [[onSuperstep]]. */
    onBeforeSuperstep: (DataFrame, Int) => Unit = (_, _) => (),
    /** Named aggregator expressions (reference master/worker aggregators)
      * evaluated over the post-superstep vertex frame — one aggregation
      * job per superstep, scalars only on the driver. Values feed
      * [[aggregatorWriter]]. */
    aggregators: Map[String, Column] = Map.empty,
    /** AggregatorWriter (reference aggregators/AggregatorWriter.java +
      * TextAggregatorWriter): receives (superstep, name → value) after
      * every superstep when `aggregators` is non-empty. See
      * [[Pregel.textAggregatorWriter]] for the text-sink default. */
    aggregatorWriter: Option[(Int, Map[String, Any]) => Unit] = None)

/** Pregel-style Bulk-Synchronous-Parallel loop on DataFrames.
  *
  * Re-expresses the reference's superstep machinery
  * (giraph-core .../graph/GraphTaskManager.java:309-382 worker loop,
  * .../master/BspServiceMaster.java:1571-1741 master coordination) as a
  * driver-side loop over declarative Spark plans:
  *
  *  - "send messages along out-edges" = join of the active vertex frame
  *    with the edge frame on `id = src` (the shuffle IS the message
  *    routing; both sides are hash-partitioned on the join key, exactly
  *    Giraph's id-hash worker assignment,
  *    .../partition/HashPartitionerFactory.java:31-37);
  *  - the MessageCombiner (.../combiner/MessageCombiner.java:32-47) =
  *    `groupBy(id).agg(combine)` — Catalyst's HashAggregate already
  *    performs the sender-side (partial) + receiver-side (final) split;
  *  - `voteToHalt`/wake-on-message (.../graph/Vertex.java:85,184) = the
  *    boolean `active` column maintained by the vertex program; global
  *    termination = zero active vertices (BspServiceMaster.java:1681-1684);
  *  - checkpointing (.../worker/BspServiceWorker.java:1340-1460) =
  *    `localCheckpoint` cadence (also mandatory here to cut lineage).
  *
  * Scale posture: per superstep the only driver-side data is the active
  * count (a scalar) — vertex/edge/message frames never leave the cluster.
  * Edges are shuffled once to their `src` hash partition and reused by
  * every superstep's join, so each iteration shuffles only the (combined)
  * message frame.
  */
object Pregel {

  /** Run a BSP loop.
    *
    * @param vertices   (id BIGINT, ..state.., active BOOLEAN)
    * @param edges      (src BIGINT, dst BIGINT, ..attrs..); names must not
    *                   collide with vertex state columns
    * @param sendMsg    active-vertices ⋈ edges (all vertex cols + edge cols)
    *                   → message frame with columns (id, msg); `id` is the
    *                   destination vertex
    * @param combineMsg aggregate over `msg` applied per destination, e.g.
    *                   `min(col("msg"))` — the MessageCombiner
    * @param vprog      (vertices, combinedMsgs(id, msg)) → new vertex frame
    *                   with the same schema incl. a fresh `active` column
    * @return the converged vertex frame (caller should select/unpersist)
    */
  def run(
      vertices: DataFrame,
      edges: DataFrame,
      sendMsg: DataFrame => DataFrame,
      combineMsg: Column,
      vprog: (DataFrame, DataFrame) => DataFrame,
      opts: PregelOptions = PregelOptions()): DataFrame = {

    val spark = vertices.sparkSession
    // Declared-partitioning checkpoints (CheckpointBridge): under AQE a
    // plain localCheckpoint/persist loses its partitioning (the adaptive
    // plan reports Unknown pre-execution), which silently reshuffles the
    // edge AND vertex frames at every superstep join. The explicit-count
    // layout is materialized once and DECLARED, so the id=src join and
    // the vprog join are exchange-free on these sides — the one-shuffle-
    // per-superstep (combined messages only) contract, enforced by the
    // CoverageSpec plan assertion.
    val numParts = spark.sessionState.conf.numShufflePartitions
    val e = org.apache.spark.sql.graft.CheckpointBridge
      .localCheckpointHash(edges.toDF(), "src", numParts)

    val resumed = resumePoint(spark, opts)
    var verts = resumed.map(_._2).getOrElse(vertices).persist(opts.storageLevel)
    var fromCaller = true
    var active = verts.filter(col("active")).count()
    var step = resumed.map(_._1 + 1).getOrElse(0)
    while (active > 0L && step < opts.maxSupersteps) {
      opts.onBeforeSuperstep(verts, step)
      val msgs = sendMsg(verts.filter(col("active")).join(e, col("id") === col("src")))
        .groupBy("id").agg(combineMsg.as("msg"))
      // eager localCheckpoint: materializes AND truncates the logical
      // plan — without it the plan tree grows exponentially with the
      // superstep count (each step references the previous frame 2-3
      // times) and analysis alone OOMs (SURVEY §7.4 risk #1). The
      // active-count rides the materialization job (fused accumulator):
      // one driver barrier per superstep, not two.
      val (newVerts, nActive) = materializeCount(vprog(verts, msgs), step, opts, numParts)
      active = nActive
      writeAggregates(newVerts, step, opts)
      opts.onSuperstep(newVerts, step)
      // first frame is the caller's (persisted — plain unpersist; freeing
      // its plan leaves could kill caller-owned checkpoints); later frames
      // are this loop's own materialize() products
      if (fromCaller) { verts.unpersist(); fromCaller = false }
      else org.apache.spark.sql.graft.CheckpointBridge.free(verts)
      verts = newVerts
      step += 1
    }
    org.apache.spark.sql.graft.CheckpointBridge.free(e)
    verts
  }

  /** [[run]] with NO MessageCombiner — the reference's default mode:
    * when no combiner is registered, `Computation.compute(vertex,
    * messages)` receives the RAW message iterable
    * (CORE/graph/ComputeCallable.java:279-340). Here `vprog` receives
    * the combined frame with `msg` as an ARRAY of all messages sent to
    * the vertex this superstep, in ARBITRARY order (Giraph's iterable
    * is equally unordered — programs must be order-insensitive, or
    * sort/aggregate the array themselves with `sort_array`/
    * `aggregate`).
    *
    * Memory contract (same as the reference without a combiner): every
    * message to one vertex materializes in that vertex's row, so the
    * per-row bound is max-in-degree × message size. At warehouse scale
    * prefer a real combiner whenever the program's reduction is
    * associative — this mode exists for the computations that genuinely
    * need the full list (e.g. the reference's VerifyMessage). The
    * `groupBy(id).agg(collect_list)` still map-side PARTIALLY collects
    * per sender partition, so the shuffle moves each message once. */
  def runMessageList(
      vertices: DataFrame,
      edges: DataFrame,
      sendMsg: DataFrame => DataFrame,
      vprog: (DataFrame, DataFrame) => DataFrame,
      opts: PregelOptions = PregelOptions()): DataFrame =
    run(vertices, edges, sendMsg, collect_list(col("msg")), vprog, opts)

  /** Fixed-iteration variant with a per-iteration driver hook ("master
    * compute", giraph-core .../master/MasterCompute.java:49-294): `master`
    * sees the superstep number and the current vertex frame and may halt
    * early by returning false (e.g. on a collected convergence aggregate —
    * scalars only, never per-vertex data).
    */
  def iterate(
      vertices: DataFrame,
      iterations: Int,
      opts: PregelOptions = PregelOptions())(
      step: (DataFrame, Int) => DataFrame,
      master: (DataFrame, Int) => Boolean = (_, _) => true): DataFrame = {
    val resumed = resumePoint(vertices.sparkSession, opts)
    val numParts = vertices.sparkSession.sessionState.conf.numShufflePartitions
    var verts = resumed.map(_._2).getOrElse(vertices).persist(opts.storageLevel)
    var fromCaller = true
    verts.count()
    var i = resumed.map(_._1 + 1).getOrElse(0)
    var go = true
    while (i < iterations && go) {
      opts.onBeforeSuperstep(verts, i)
      // materialize is eager (both checkpoint flavors) — it already ran
      // the superstep's job, so no extra action is needed here
      val next = materialize(step(verts, i), i, opts, numParts)
      writeAggregates(next, i, opts)
      opts.onSuperstep(next, i)
      if (fromCaller) { verts.unpersist(); fromCaller = false }
      else org.apache.spark.sql.graft.CheckpointBridge.free(verts)
      verts = next
      go = master(verts, i)
      i += 1
    }
    verts
  }

  /** A text-sink AggregatorWriter appending "superstep<TAB>name<TAB>value"
    * lines to `path` — the reference's TextAggregatorWriter
    * (CORE/aggregators/TextAggregatorWriter.java:95-113) default format.
    * Driver-side file: aggregator values are master-side scalars. */
  def textAggregatorWriter(path: String): (Int, Map[String, Any]) => Unit =
    (step, values) => {
      val w = new java.io.FileWriter(path, true)
      try values.toSeq.sortBy(_._1)
        .foreach { case (k, v) => w.write(s"$step\t$k\t$v\n") }
      finally w.close()
    }

  /** Evaluate the configured aggregators over the (already materialized)
    * superstep frame and hand the scalars to the writer — one extra
    * aggregation job per superstep, only when aggregators are set. */
  private def writeAggregates(verts: DataFrame, step: Int, opts: PregelOptions): Unit =
    opts.aggregatorWriter.foreach { w =>
      if (opts.aggregators.nonEmpty) {
        val exprs = opts.aggregators.toSeq.map { case (nm, c) => c.as(nm) }
        val row = verts.agg(exprs.head, exprs.tail: _*).first()
        w(step, opts.aggregators.keys.map(nm => nm -> row.getAs[Any](nm)).toMap)
      }
    }

  /** Eagerly materialize one superstep's frame with truncated lineage:
    * on the configured cadence with a checkpoint dir set, a *restartable*
    * parquet snapshot (`<dir>/step_<N>`) read straight back (the write is
    * the materializing action; the read-back plan is a bare scan — both
    * reliable and resumable, unlike `RDD.checkpoint` files which die with
    * the SparkContext); a declared-hash(id) localCheckpoint otherwise
    * (plain localCheckpoint loses partitioning under AQE — see run()). */
  /** Checkpoint without a fused count — for loops whose frames carry no
    * `active` column (fixed-iteration mode terminates by master check). */
  private def materialize(df: DataFrame, step: Int, opts: PregelOptions,
                          numParts: Int): DataFrame =
    opts.checkpointDir match {
      case Some(dir) if (step + 1) % opts.checkpointEvery == 0 =>
        val path = s"$dir/step_$step"
        df.write.mode("overwrite").parquet(path)
        df.sparkSession.read.parquet(path)
      case _ => org.apache.spark.sql.graft.CheckpointBridge
        .localCheckpointHash(df, "id", numParts)
    }

  private def materializeCount(df: DataFrame, step: Int, opts: PregelOptions,
                               numParts: Int): (DataFrame, Long) =
    opts.checkpointDir match {
      case Some(dir) if (step + 1) % opts.checkpointEvery == 0 =>
        val path = s"$dir/step_$step"
        df.write.mode("overwrite").parquet(path)
        val back = df.sparkSession.read.parquet(path)
        (back, back.filter(col("active")).count())
      case _ => org.apache.spark.sql.graft.CheckpointBridge
        .localCheckpointHashCount(df, "id", numParts, "active")
    }

  /** The latest completed snapshot under `dir`: (superstep, frame).
    * Only `step_<N>` dirs holding a `_SUCCESS` marker count — a write
    * that died mid-flight is invisible, exactly the reference's
    * checkpoint-validity rule (BspServiceMaster.getLastGoodCheckpoint,
    * BspServiceMaster.java:1190-1223). */
  def latestCheckpoint(spark: org.apache.spark.sql.SparkSession,
                       dir: String): Option[(Int, DataFrame)] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else {
      val stepRe = "step_(\\d+)".r
      val steps = fs.listStatus(root).filter(_.isDirectory).flatMap { st =>
        st.getPath.getName match {
          case stepRe(n) if fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")) =>
            Some((n.toInt, st.getPath.toString))
          case _ => None
        }
      }
      if (steps.isEmpty) None
      else {
        val (n, path) = steps.maxBy(_._1)
        Some((n, spark.read.parquet(path)))
      }
    }
  }

  private def resumePoint(spark: org.apache.spark.sql.SparkSession,
                          opts: PregelOptions): Option[(Int, DataFrame)] =
    if (opts.resume) opts.checkpointDir.flatMap(latestCheckpoint(spark, _)) else None
}
