package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized oracle for [[AsOfJoin.backward]] (round-13 verdict task 3a):
  * random event/quote streams — duplicate timestamps on both sides,
  * multiple keys, empty sides, null left keys — against an in-memory
  * argmax scan sharing no code with the window encoding. The operator's
  * contract under test: per left row, the right row with the greatest
  * rightTs ≤ leftTs (strictly < when non-inclusive), ties on rightTs
  * resolved to the greatest `rightTieBreak`; null-keyed left rows carry
  * no match; null-keyed right rows match nothing. */
class AsOfJoinPropertySpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val leftSchema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("t", LongType, nullable = false),
    StructField("lid", LongType, nullable = false)))
  private val rightSchema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("rt", LongType, nullable = false),
    StructField("rid", LongType, nullable = false),
    StructField("payload", LongType, nullable = false)))

  /** The rule, written the obvious way: filter candidates, take the
    * (rt, rid)-max. */
  private def refAsOf(left: Seq[(Option[Long], Long, Long)],
                      right: Seq[(Option[Long], Long, Long, Long)],
                      inclusive: Boolean): Map[Long, Option[(Long, Long)]] =
    left.map { case (k, t, lid) =>
      val cand = right.filter { case (rk, rt, _, _) =>
        rk.isDefined && k.isDefined && rk == k &&
          (rt < t || (inclusive && rt == t))
      }
      val best = if (cand.isEmpty) None
        else Some(cand.maxBy { case (_, rt, rid, _) => (rt, rid) })
      lid -> best.map { case (_, _, rid, payload) => (rid, payload) }
    }.toMap

  test("backward as-of join equals the in-memory argmax scan") {
    val key = Gen.frequency(9 -> Gen.choose(0L, 3L).map(Option(_)), 1 -> Gen.const(None))
    val gen = for {
      nl <- Gen.choose(0, 25)
      nr <- Gen.choose(0, 25)
      ls <- Gen.listOfN(nl, Gen.zip(key, Gen.choose(0L, 15L)))
      rs <- Gen.listOfN(nr, Gen.zip(key, Gen.choose(0L, 15L), Gen.choose(0L, 999L)))
      inclusive <- Gen.oneOf(true, false)
    } yield (ls, rs, inclusive)
    val prop = Prop.forAll(gen) { case (ls, rs, inclusive) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val right = rs.zipWithIndex.map { case ((k, rt, p), i) => (k, rt, i.toLong, p) }
      val lDf = spark.createDataFrame(
        spark.sparkContext.parallelize(left.map { case (k, t, lid) =>
          Row(k.orNull, t, lid) }, 3), leftSchema)
      val rDf = spark.createDataFrame(
        spark.sparkContext.parallelize(right.map { case (k, rt, rid, p) =>
          Row(k.orNull, rt, rid, p) }, 3), rightSchema)
      val got = AsOfJoin.backward(lDf, rDf, key = "k", leftTs = "t", rightTs = "rt",
          rightCols = Seq("rid", "payload"), inclusive = inclusive,
          rightTieBreak = Some("rid"))
        .collect()
        .map { r =>
          val rid = if (r.isNullAt(3)) None else Some(r.getLong(3))
          r.getLong(2) -> rid.map(id => (id, r.getLong(4)))
        }.toMap
      val want = refAsOf(left, right, inclusive)
      if (got != want)
        System.err.println(s"MISMATCH inclusive=$inclusive\n left=$left\n right=$right\n got=$got\n want=$want")
      got == want
    }
    val r = SCTest.check(propParams(1402L, 30), prop)
    assert(r.passed, s"as-of join vs argmax scan: ${r.status}")
  }
}
