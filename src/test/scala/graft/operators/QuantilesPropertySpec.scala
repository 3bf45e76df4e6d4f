package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized oracle for the exact-integer quantile family (round-13
  * verdict task 3c): random multisets — heavy ties, negative values,
  * singleton groups — against a sorted-array rule sharing none of the
  * window/join machinery. Three contracts:
  *  - [[Quantiles.exactScaled]]: continuous quantile at p = num/den over
  *    n sorted values, position r + rem/den, value
  *    v_r·scale + ⌊(v_{r+1} − v_r)·scale·rem/den⌋ — pure BIGINTs;
  *  - [[Quantiles.exactScaledGlobal]]: identical numbers from the
  *    range-partitioned global-rank path (no per-group window);
  *  - [[Quantiles.weightedMedian]]: smallest v with 2·cumw ≥ W. */
class QuantilesPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Ps = Seq((1, 4), (1, 2), (3, 4), (9, 10))
  private val Scale = 1000L

  /** The sorted-array rule. */
  private def refQuantile(vs: Seq[Long], num: Int, den: Int): Long = {
    val s = vs.sorted
    val n = s.length.toLong
    val r = (num * (n - 1)) / den
    val rem = (num * (n - 1)) % den
    val vlo = s(r.toInt)
    val vhi = if (r + 1 < n) s(r.toInt + 1) else vlo
    vlo * Scale + Math.floorDiv((vhi - vlo) * Scale * rem, den.toLong)
  }

  private def refWeightedMedian(vw: Seq[(Long, Long)]): Long = {
    val s = vw.sortBy(_._1)
    val tw = s.map(_._2).sum
    var cum = 0L
    s.collectFirst { case (v, w) if { cum += w; 2 * cum >= tw } => v }.get
  }

  test("exactScaled equals the sorted-array rule on random multisets") {
    val gen = for {
      ng <- Gen.choose(1, 4)
      rows <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, ng - 1L), Gen.choose(-50L, 50L)))
    } yield rows
    val prop = Prop.forAll(gen) { rows =>
      val got = Quantiles.exactScaled(rows.toDF("g0", "v0"),
          valueCol = "v0", groupCol = "g0", ps = Ps, scale = Scale)
        .as[(Long, Int, Int, Long)].collect()
        .map { case (g, pn, pd, q) => (g, pn, pd) -> q }.toMap
      val want = (for {
        (g, vs) <- rows.groupBy(_._1).toSeq
        (pn, pd) <- Ps
      } yield (g, pn, pd) -> refQuantile(vs.map(_._2), pn, pd)).toMap
      if (got != want)
        System.err.println(s"MISMATCH rows=$rows\n got=$got\n want=$want")
      got == want
    }
    val r = SCTest.check(propParams(1404L, 40, tag = "exactScaled"), prop)
    assert(r.passed, s"exactScaled vs sorted-array rule: ${r.status}")
  }

  test("exactScaledGlobal reproduces exactScaled's numbers without the window") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-50L, 50L))
    val prop = Prop.forAll(gen) { vs =>
      val got = Quantiles.exactScaledGlobal(vs.toDF("v0"),
          valueCol = "v0", groupName = "all", ps = Ps, scale = Scale)
        .as[(String, Int, Int, Long)].collect()
        .map { case (_, pn, pd, q) => (pn, pd) -> q }.toMap
      val want = Ps.map { case (pn, pd) => (pn, pd) -> refQuantile(vs, pn, pd) }.toMap
      if (got != want)
        System.err.println(s"MISMATCH vs=$vs\n got=$got\n want=$want")
      got == want
    }
    val r = SCTest.check(propParams(1405L, 25, tag = "exactScaledGlobal"), prop)
    assert(r.passed, s"exactScaledGlobal vs sorted-array rule: ${r.status}")
  }

  test("weightedMedian equals the running-weight rule") {
    val gen = for {
      ng <- Gen.choose(1, 4)
      rows <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, ng - 1L),
        Gen.choose(-50L, 50L), Gen.choose(1L, 9L)))
    } yield rows
    val prop = Prop.forAll(gen) { rows =>
      val got = Quantiles.weightedMedian(rows.toDF("g0", "v0", "w0"),
          valueCol = "v0", weightCol = "w0", groupCol = "g0")
        .select("g", "wmedian").as[(Long, Long)].collect().toMap
      val want = rows.groupBy(_._1).map { case (g, vw) =>
        g -> refWeightedMedian(vw.map(t => (t._2, t._3)))
      }
      if (got != want)
        System.err.println(s"MISMATCH rows=$rows\n got=$got\n want=$want")
      got == want
    }
    val r = SCTest.check(propParams(1406L, 40, tag = "weightedMedian"), prop)
    assert(r.passed, s"weightedMedian vs running-weight rule: ${r.status}")
  }
}
