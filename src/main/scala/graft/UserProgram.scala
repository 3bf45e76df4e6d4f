package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** A user-supplied vertex program, loadable by name from the CLI —
  * the Spark-native analog of `GiraphRunner`'s dynamically loaded
  * `Computation` class (giraph-core .../GiraphRunner.java:69-94, where
  * the first positional argument names a Computation on the job
  * classpath). A user brings a jar with an implementation, points
  * `graft.cli.GraftRunner run-class --class <fqcn>` at it, and the
  * engine drives it through the standard [[graft.graph.Pregel.run]]
  * superstep loop — same lifecycle, combiners, checkpoints and
  * termination protocol as the built-in algorithms.
  *
  * Implementations must have a public no-arg constructor.
  */
trait UserProgram {

  /** Build the initial vertex frame from the edge frame. Must produce
    * the [[graft.graph.Pregel.run]] vertex contract: an `id` column, an
    * `active` boolean, plus any program-specific value columns. */
  def init(spark: SparkSession, edges: DataFrame, opts: Map[String, String]): DataFrame

  /** Message generation: receives the active-vertex ⋈ edge frame
    * (vertex columns + src/dst/edge columns) and returns a frame with
    * `id` (destination) and the message payload column(s). */
  def sendMsg(joined: DataFrame): DataFrame

  /** Message combiner aggregate over the payload (e.g. `min(col("m"))`),
    * applied per destination `id` — partial (map-side) + final, exactly
    * the reference's MessageCombiner contract.
    *
    * DEFAULT: no combiner — exactly Giraph's default, where
    * `Computation.compute(vertex, messages)` receives the raw message
    * iterable unless a MessageCombiner is registered
    * (CORE/graph/ComputeCallable.java:279-340). Here [[vprog]] then sees
    * `msg` as an ARRAY of every message sent to the vertex, in arbitrary
    * order (Giraph's iterable is equally unordered). Memory contract:
    * one vertex's messages materialize in one row (bound =
    * max-in-degree × message size) — override with a real aggregate
    * whenever the reduction is associative. */
  def combineMsg: Column = org.apache.spark.sql.functions.collect_list(
    org.apache.spark.sql.functions.col("msg"))

  /** Vertex program: previous vertex frame ⋈ combined `msg` frame →
    * next vertex frame (same schema as `init`'s result). */
  def vprog(verts: DataFrame, msgs: DataFrame): DataFrame

  /** Superstep cap (the CLI's `--iters` overrides when passed). */
  def maxSupersteps: Int = 30
}
