package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins — the hand-rolled fallback when AQE's
  * runtime skew-join splitting isn't available (e.g. the skewed side is
  * already partitioned by an upstream stage) or a hub key is so hot a
  * single task would still own it.
  *
  * The reference rebalances by moving whole partitions between workers
  * (giraph-core .../partition/PartitionBalancer.java, master-driven).
  * Here the equivalent lever is key salting: scatter the skewed side's
  * rows across `salt` sub-keys, replicate the other side to every
  * sub-key, join on (key, salt). Join output is row-for-row identical to
  * the unsalted join.
  */
object Skew {

  /** Inner-join `skewed` with `other` on `key`, salting the skewed side
    * `salt` ways. `other` is replicated `salt`× — keep it the smaller
    * side. The salt is a deterministic hash of the skewed row, so the
    * plan stays reproducible. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, salt: Int): DataFrame = {
    val sCols = skewed.columns
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(sCols.map(col).toSeq: _*), lit(salt.toLong)).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
