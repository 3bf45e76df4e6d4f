package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, t, id); right: (key, t, reading)
  private def left = Seq(
    (1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 25L, "e3"),
    (2L, 5L, "e4"), (3L, 50L, "e5")
  ).toDF("k", "t", "id")

  private def right = Seq(
    (1L, 10L, 100L), (1L, 24L, 200L), (1L, 26L, 300L),
    (2L, 6L, 400L) // after e4 — no match for key 2
  ).toDF("k", "t", "reading")

  test("backward inclusive picks the latest right row at-or-before each left row") {
    val out = AsOfJoin.backward(
        left, right.withColumnRenamed("t", "rt"),
        key = "k", leftTs = "t", rightTs = "rt",
        rightCols = Seq("reading"), rightTieBreak = Some("reading"))
      .orderBy("id").as[(Long, Long, String, Option[Long])].collect()
    assert(out.toSeq == Seq(
      (1L, 10L, "e1", Some(100L)),  // inclusive: t == rt matches
      (1L, 20L, "e2", Some(100L)),
      (1L, 25L, "e3", Some(200L)),  // 26 is in the future
      (2L, 5L, "e4", None),         // only future readings on key 2
      (3L, 50L, "e5", None)))       // no right rows at all on key 3
  }

  test("backward exclusive ignores right rows at exactly the left timestamp") {
    val out = AsOfJoin.backward(
        left, right.withColumnRenamed("t", "rt"),
        key = "k", leftTs = "t", rightTs = "rt",
        rightCols = Seq("reading"), inclusive = false,
        rightTieBreak = Some("reading"))
      .orderBy("id").as[(Long, Long, String, Option[Long])].collect()
    assert(out.head == ((1L, 10L, "e1", None))) // strict <: self-time hidden
    assert(out(2) == ((1L, 25L, "e3", Some(200L))))
  }

  test("equal-timestamp right rows break ties deterministically (max tiebreak wins)") {
    val r2 = Seq((1L, 10L, 7L), (1L, 10L, 9L)).toDF("k", "rt", "reading")
    val out = AsOfJoin.backward(left.filter($"id" === "e2"), r2,
        key = "k", leftTs = "t", rightTs = "rt",
        rightCols = Seq("reading"), rightTieBreak = Some("reading"))
      .as[(Long, Long, String, Option[Long])].collect()
    assert(out.head._4.contains(9L)) // last in (t, side, tie) order carries
  }

  test("randomized: matches the brute-force as-of on 300 seeded rows") {
    val rnd = new scala.util.Random(42)
    val ls = Seq.tabulate(200)(i => (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong))
    val rs = Seq.tabulate(100)(i => (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, 1000L + i))
    // brute force: per left row, right rows with same key, rt <= t,
    // max (rt, rid) wins — mirrors (t, side, tie) window order
    val expected = ls.map { case (k, t, id) =>
      val m = rs.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      (id, m)
    }.toMap
    val got = AsOfJoin.backward(
        ls.toDF("k", "t", "id"), rs.toDF("k", "rt", "rid"),
        key = "k", leftTs = "t", rightTs = "rt",
        rightCols = Seq("rid"), rightTieBreak = Some("rid"))
      .select(col("id"), col("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == expected)
  }

  test("plan shape: one exchange on the key, no cartesian/range join") {
    val out = AsOfJoin.backward(left, right.withColumnRenamed("t", "rt"),
      key = "k", leftTs = "t", rightTs = "rt", rightCols = Seq("reading"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
