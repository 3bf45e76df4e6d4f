package graft

import org.apache.spark.sql.SparkSession

/** Liveness slack for SINGLE-JVM local-mode sessions.
  *
  * In local mode driver and executor share one process, so the executor
  * heartbeat carries no liveness signal the process itself doesn't —
  * but a stop-the-world pause longer than the 120 s default (observed
  * twice at probe scale: a post-query System.gc() on the 48 g heap and
  * a spill-heavy CDC join each froze the JVM 2.5–3 min) still gets the
  * executor "removed" by HeartbeatReceiver and the context shut down
  * mid-run. Every local main (Verify, Bench, probes, the CLI's local
  * default) widens the window; cluster submissions keep Spark defaults
  * (there the heartbeat IS the liveness signal — see GraftRunner's
  * SPARK_MASTER branch, which does not apply this). */
object LocalLiveness {
  /** The 600 s default also delays RPC ask timeouts that inherit
    * spark.network.timeout, so a genuinely wedged local run takes up
    * to 10 min to be declared dead (ADVICE r12) — acceptable for the
    * unattended probe/bench/driver runs this guards, but interactive
    * dev runs can dial it back via SPARK_GRAFT_NETWORK_TIMEOUT
    * (any Spark duration string, e.g. "120s"). */
  def widen(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.network.timeout",
        sys.env.getOrElse("SPARK_GRAFT_NETWORK_TIMEOUT", "600s"))
      .config("spark.executor.heartbeatInterval", "60s")
}
