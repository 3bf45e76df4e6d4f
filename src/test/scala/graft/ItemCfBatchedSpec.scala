package graft

/** The bounded-scratch batched item-CF must be EXACTLY the unbatched
  * query: same rows, same order (`SignalQueries.itemCf` splits the i1
  * side of the co-occurrence self-join by xxhash64(i) % batches and
  * runs the full per-item pipeline per batch — the top-5 window is
  * i1-partitioned and i1 ≡ the batch key, so the split must be
  * invisible in the output). 3 batches exercises non-trivial hashing
  * (items land in different batches) and the sequential checkpoint
  * accumulation; the global popularity reuse is what keeps the cosine
  * denominators identical across paths. */
class ItemCfBatchedSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("batched item-CF equals the unbatched plan row-for-row") {
    assume(new java.io.File(s"$sf/orders.parquet").exists())
    val plain = SignalQueries.itemCf(spark, sf, 1).collect()
    val batched = SignalQueries.itemCf(spark, sf, 3).collect()
    assert(plain.nonEmpty)
    assert(batched.toSeq == plain.toSeq)
  }
}
