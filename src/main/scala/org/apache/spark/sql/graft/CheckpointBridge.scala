package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

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
  def free(df: Dataset[_]): Unit = {
    df.unpersist(false)
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** Block until the listener bus has delivered all queued events —
    * needed by anything reading SparkListener-fed counters (job counts
    * are delivered asynchronously; a sleep is a race). private[spark],
    * hence exposed through this bridge package. */
  def drainListeners(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
