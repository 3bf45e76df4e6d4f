package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 10L, "p1"), (1L, 105L, "p2"), (1L, 199L, "p3"),
    (2L, 105L, "p4")
  ).toDF("k", "t", "pid")

  // intervals of length ≤ bucketWidth(100): spans at most 2 buckets
  private def intervals = Seq(
    (1L, 100L, 199L, "iv1"),  // catches p2 (105) and p3 (199, inclusive end)
    (1L, 5L, 10L, "iv2"),     // catches p1 (inclusive end)
    (2L, 300L, 390L, "iv3")   // nothing (p4 at 105 outside)
  ).toDF("k", "s", "e", "iv")

  test("bucketized range join matches exact containment, no dup pairs") {
    val got = RangeJoin.pointInInterval(points, intervals,
        key = "k", t = "t", start = "s", end = "e", bucketWidth = 100L)
      .select(col("pid"), col("iv")).as[(String, String)].collect().toSeq
    assert(got.sorted == Seq(("p1", "iv2"), ("p2", "iv1"), ("p3", "iv1")))
    // p3 at t=199 with iv1 covering buckets {1}: same pair via one bucket only
    assert(got.size == got.toSet.size)
  }

  test("interval spanning a bucket boundary still meets its points once") {
    val iv = Seq((1L, 90L, 110L, "ivX")).toDF("k", "s", "e", "iv")
    val got = RangeJoin.pointInInterval(points, iv,
        "k", "t", "s", "e", bucketWidth = 100L)
      .select(col("pid")).as[String].collect().toSeq
    assert(got == Seq("p2")) // t=105 ∈ [90,110]; p1 at 10 outside
  }

  test("randomized: equals the naive theta join on 300 seeded rows") {
    val rnd = new scala.util.Random(7)
    val ps = Seq.tabulate(200)(i => (rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val is = Seq.tabulate(100) { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(6).toLong, s, s + rnd.nextInt(97).toLong, 1000L + i)
    }
    val expected = (for {
      (pk, t, pid) <- ps; (ik, s, e, iid) <- is
      if pk == ik && t >= s && t <= e
    } yield (pid, iid)).toSet
    val got = RangeJoin.pointInInterval(
        ps.toDF("k", "t", "pid"), is.toDF("k", "s", "e", "iid"),
        key = "k", t = "t", start = "s", end = "e", bucketWidth = 100L)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect()
    assert(got.length == got.toSet.size) // no duplicate pairs
    assert(got.toSet == expected)
  }

  test("plan: equi-join on (key, bucket), no cartesian or nested loop") {
    val out = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e", 100L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
