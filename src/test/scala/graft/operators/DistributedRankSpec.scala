package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct unit coverage for the range-partitioned global rank/cumsum
  * operator (the ten driver queries exercise it end-to-end; these tests
  * pin the operator contract itself, including the partition-count
  * derivation and the NULL edge cases in the offset collects). */
class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  test("global row number and cumsum match the in-memory sort") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map(i => (i.toLong, rnd.nextInt(40).toLong))
    val out = DistributedRank.withRankAndCumSum(
        rows.toDF("id", "v"), Seq(col("v"), col("id")), "rn",
        Some((col("v"), "cum")))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3)
    val exp = rows.sortBy(r => (r._2, r._1))
    var cum = 0L
    exp.zip(out).zipWithIndex.foreach { case (((id, v), (oid, _, orn, ocum)), i) =>
      cum += v
      assert(oid == id && orn == i + 1 && ocum == cum, s"row $i")
    }
  }

  test("default numParts follows spark.sql.shuffle.partitions") {
    val df = Seq((1L, 2L)).toDF("id", "v")
    assert(DistributedRank.resolveParts(df, 0) ==
      spark.sessionState.conf.numShufflePartitions)
    assert(DistributedRank.resolveParts(df, 7) == 7)
  }

  test("the range exchange stays balanced under a skewed leading order key") {
    // 90% of rows share one leading key value; the unique id tiebreak
    // makes the order total, so the range exchange splits WITHIN the hot
    // key — this is the scale contract every DistributedRank caller
    // relies on. AQE coalescing is disabled for the measurement only (at
    // test scale AQE folds the kB-sized shuffle to one partition, which
    // is correct behavior and irrelevant to the skew question).
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val np = spark.sessionState.conf.numShufflePartitions
      val n = 4000
      val rows = (0 until n).map(i =>
        (i.toLong, if (i % 10 == 0) i.toLong % 97 else 7L))
      val perPart = rows.toDF("id", "k")
        .repartitionByRange(np, col("k"), col("id"))
        .select(spark_partition_id().as("p"))
        .groupBy("p").count().as[(Int, Long)].collect()
      assert(perPart.length == np,
        s"expected $np range partitions, got ${perPart.length}")
      val cap = 2L * n / np // range-sampling slack; a skew wall would be ~0.9n
      perPart.foreach { case (p, c) =>
        assert(c <= cap, s"partition $p holds $c rows (> $cap): skewed key " +
          "collapsed the range exchange")
      }
    } finally spark.conf.set(key, prev)
    // and under the same skew the operator's ranks are the global truth
    val rows = (0 until 4000).map(i =>
      (i.toLong, if (i % 10 == 0) i.toLong % 97 else 7L))
    val got = DistributedRank.withRowNumber(
        rows.toDF("id", "k"), Seq(col("k"), col("id")), "rn")
      .orderBy("rn").select("id").as[Long].collect()
    assert(got.toSeq == rows.sortBy(r => (r._2, r._1)).map(_._1))
  }

  test("cumsum offsets survive an all-NULL-sum range partition (no NPE)") {
    // values NULL exactly where the order key is small: the leading range
    // partitions aggregate sum(v) = NULL and the offset collect must
    // coalesce to 0, not NPE. A NULL in-partition prefix stays NULL —
    // identical to the global-window SQL frame here (no prior values).
    val df = (0 until 200).map(i =>
        (i.toLong, if (i < 120) None else Some(1L)))
      .toDF("id", "v")
    val out = DistributedRank.withRankAndCumSum(
        df, Seq(col("id")), "rn", Some((col("v"), "cum")), numParts = 4)
      .orderBy("rn").as[(Long, Option[Long], Long, Option[Long])].collect()
    out.foreach { case (id, _, rn, cum) =>
      assert(rn == id + 1)
      if (id < 120) assert(cum.isEmpty, s"id $id")
      else assert(cum.contains(id - 119L), s"id $id")
    }
  }

  test("strict prefix max propagates across an all-NULL range partition") {
    // ascending order on id; values present only at the two ends, NULL in
    // the middle band, so a middle range partition has no max and later
    // partitions must still see the early maximum
    val df = (0 until 200).map { i =>
      val v = if (i < 10) Some(50L + i) else if (i >= 190) Some(1L) else None
      (i.toLong, v)
    }.toDF("id", "v")
    val out = DistributedRank.withStrictPrefixMax(
        df, Seq(col("id")), col("v"), "pm", numParts = 4)
      .orderBy("id").as[(Long, Option[Long], Option[Long])].collect()
    assert(out.head._3.isEmpty) // first row has no strict predecessor
    out.filter(_._1 >= 10).foreach { case (id, _, pm) =>
      assert(pm.contains(59L), s"id $id: expected prefix max 59, got $pm")
    }
  }

  test("ntile matches SQL NTILE bucket arithmetic") {
    val df = (0 until 103).map(i => Tuple1(i.toLong)).toDF("v")
    val got = DistributedRank.withNtile(df, Seq(col("v")), 5, "b")
      .orderBy("v").as[(Long, Long)].collect()
    // 103 rows, 5 buckets: sizes 21,21,21,20,20
    val sizes = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes == Map(1L -> 21, 2L -> 21, 3L -> 21, 4L -> 20, 5L -> 20))
    // bucket numbers are non-decreasing in order
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
  }
}
