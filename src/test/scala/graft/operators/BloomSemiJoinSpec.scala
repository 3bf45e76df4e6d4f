package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Bloom filter's two contract halves: NEVER a false negative (the
  * correctness half — the oracle can only pin the final semi-join, so
  * the no-drop property needs its own assert), and real pruning on
  * non-members (the reason the operator exists). */
class BloomSemiJoinSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every build key passes its own filter") {
    val keys = (0L until 500L).map(i => i * 7919L).toDF("k")
    val words = BloomSemiJoin.build(keys, "k")
    assert(keys.filter(!BloomSemiJoin.mightContain(words, col("k"))).count() === 0L)
  }

  test("prunes most non-members and the exact join removes the rest") {
    val keys = (0L until 300L).toDF("k")
    val probe = (0L until 20000L).map(i => i * 13L % 10007L).toDF("p")
    val words = BloomSemiJoin.build(keys, "k")
    val bloomPass = probe.filter(BloomSemiJoin.mightContain(words, col("p")))
    val trueMembers = probe.join(keys, col("p") === col("k"), "left_semi")
    val nPass = bloomPass.count()
    val nTrue = trueMembers.count()
    // contains all true members...
    assert(bloomPass.join(keys, col("p") === col("k"), "left_semi").count() === nTrue)
    // ...and at 65536 bits / 300 keys the false-positive rate is ~1e-7:
    // the pass set should be dramatically smaller than the probe side
    assert(nPass < probe.count() / 10)
    assert(nPass >= nTrue)
    // end-to-end operator equals the plain semi-join exactly
    val pruned = BloomSemiJoin.prunedSemiJoin(probe, "p", keys, "k")
      .orderBy("p").as[Long].collect().toSeq
    val plain = trueMembers.orderBy("p").as[Long].collect().toSeq
    assert(pruned === plain)
  }
}
