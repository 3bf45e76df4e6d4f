package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized oracle for [[RangeJoin.pointInInterval]] (round-13 verdict
  * task 3b): random points and intervals — boundary hits, zero-length
  * and inverted (empty) intervals, negative times straddling bucket 0,
  * duplicate rows — against a brute nested loop, across random bucket
  * widths. The bucketization must be invisible: exactly the pairs with
  * start ≤ t ≤ end on the same key, each pair exactly once (a point
  * lives in ONE bucket, so no DISTINCT pass exists to mask double
  * counting — multiplicity is part of the contract). */
class RangeJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  test("bucketized point-in-interval equals the brute nested loop") {
    val gen = for {
      np <- Gen.choose(0, 30)
      ni <- Gen.choose(0, 20)
      pts <- Gen.listOfN(np, Gen.zip(Gen.choose(0L, 3L), Gen.choose(-20L, 20L)))
      // ~1/4 of intervals inverted (s > e): must match nothing
      ivs <- Gen.listOfN(ni, Gen.zip(Gen.choose(0L, 3L), Gen.choose(-20L, 20L),
        Gen.choose(-8L, 12L)))
      width <- Gen.choose(1L, 10L)
    } yield (pts, ivs, width)
    val prop = Prop.forAll(gen) { case (pts, ivs0, width) =>
      val ivs = ivs0.zipWithIndex.map { case ((k, s, len), i) =>
        (k, s, s + len, i.toLong)
      }
      val points = pts.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val got = RangeJoin.pointInInterval(
          points.toDF("k", "t", "pid"),
          ivs.toDF("k", "s", "e", "iid"),
          key = "k", t = "t", start = "s", end = "e", bucketWidth = width)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      val want = (for {
        (pk, t, pid) <- points
        (ik, s, e, iid) <- ivs
        if pk == ik && t >= s && t <= e
      } yield (pid, iid)).sorted
      if (got != want)
        System.err.println(s"MISMATCH width=$width\n pts=$points\n ivs=$ivs\n got=$got\n want=$want")
      got == want
    }
    val r = SCTest.check(propParams(1403L, 40), prop)
    assert(r.passed, s"range join vs nested loop: ${r.status}")
  }
}
