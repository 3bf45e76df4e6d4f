package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter runtime pruning for semi-joins.
  *
  * The pattern Spark's own runtime row-group filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies
  * automatically, re-expressed as an explicit, *reproducible* operator:
  * the build side's keys are folded into an m-bit filter (one small
  * aggregation + a bounded driver collect of ≤ m/64 words — the
  * master-collects-scalars rule), and the probe side is pre-filtered by a
  * fully codegen'd membership test BEFORE the join shuffle. False
  * positives are removed by the exact (broadcast) semi-join that follows,
  * so the operator is result-invisible — which is exactly what lets a
  * standing DuckDB oracle pin it: the oracle runs the plain semi-join.
  *
  * At 100 TB the value is shuffle-input reduction: a 0.3-selectivity key
  * set means ~70% of the probe table never reaches the join exchange.
  * Spark's built-in runtime filter does this with non-reproducible
  * hashes; this one uses the repo-standard md5-prefix positions so the
  * same filter bits come out on every engine and every run (the spec
  * asserts zero false negatives and real pruning on the probe side).
  *
  * Reference semantics: giraph has no relational joins (SURVEY §2.10);
  * this is pipeline-widening infrastructure for the warehouse corpus.
  */
object BloomSemiJoin {

  /** Filter size in bits (2^16 → 1024 longs ≈ 8 KiB: broadcast-trivial).
    * At 300 build keys this gives k·n/m ≈ 0.018 fill — false-positive
    * rate (1-e^{-kn/m})^k ≈ 1e-7; size m ∝ build-key count at scale. */
  val MBits = 1 << 16
  val NumHashes = 4

  /** Bit position of hash i for `key`: the repo-standard md5-prefix
    * uniform (first 6 hex digits as a BIGINT), reduced mod m. */
  private def pos(i: Int, key: Column): Column =
    pmod(conv(substring(md5(concat(lit(s"$i:"), key.cast("string"))), 1, 6), 16, 10)
      .cast("long"), lit(MBits.toLong))

  /** Build the filter words from a key frame: explode the k positions,
    * OR the bit masks per 64-bit word (map-side-combined agg), collect
    * the ≤ m/64 non-zero words. One narrow pass over the build side. */
  def build(keys: DataFrame, keyCol: String): Array[Long] = {
    val words = keys
      .select(explode(array((0 until NumHashes).map(i => pos(i, col(keyCol))): _*)).as("p"))
      .select((col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")).as("m"))
      .groupBy(col("w")).agg(call_function("bit_or", col("m")).as("m"))
      .collect()
    val arr = new Array[Long](MBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Codegen'd membership test: all k bits set. The word array rides as
    * an array literal (8 KiB inside the plan — shipped once per task via
    * the serialized plan, not per row). */
  def mightContain(words: Array[Long], key: Column): Column = {
    val wlit = typedLit(words.toSeq)
    (0 until NumHashes).map { i =>
      val p = pos(i, key)
      val word = element_at(wlit, (p / 64).cast("int") + lit(1))
      val mask = call_function("shiftleft", lit(1L), (p % 64).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Bloom-pruned semi-join: pre-filter `probe` by the filter built on
    * `buildKeys`, then exact broadcast semi-join to drop false
    * positives. Result-identical to `probe SEMI JOIN buildKeys`. */
  def prunedSemiJoin(probe: DataFrame, probeKey: String,
                     buildKeys: DataFrame, buildKey: String): DataFrame = {
    val words = build(buildKeys, buildKey)
    probe.filter(mightContain(words, col(probeKey)))
      .join(broadcast(buildKeys.select(col(buildKey)).distinct()),
        col(probeKey) === col(buildKey), "left_semi")
  }
}
