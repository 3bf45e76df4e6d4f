package graft

/** The bounded-scratch batched K4 census must be EXACTLY the unbatched
  * one (`SignalQueries.k4Census` partitions the enumeration by the
  * clique's min vertex — xxhash64(a.u) % batches — against the full
  * edge list, so the triangle and K4 totals are a disjoint sum over
  * batches). 3 batches exercises real splitting plus the per-batch
  * scalar reduction and checkpoint release. */
class K4BatchedSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("batched K4 census equals the unbatched plan") {
    assume(new java.io.File(s"$sf/lineitem.parquet").exists())
    val plain = SignalQueries.k4Census(spark, sf, 1).collect().head
    val batched = SignalQueries.k4Census(spark, sf, 3).collect().head
    assert(plain.getLong(0) > 0)
    assert(batched.getLong(0) == plain.getLong(0))
    assert(batched.getLong(1) == plain.getLong(1))
  }
}
