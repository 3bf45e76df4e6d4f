package graft.operators

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-BigInt reference of the same quantile_cont rule. */
  private def ref(vs: Seq[Long], pnum: Int, pden: Int, scale: Long): BigInt = {
    val sorted = vs.sorted
    val n = sorted.size
    val posNum = BigInt(pnum) * (n - 1)
    val r = (posNum / pden).toInt
    val rem = posNum % pden
    val vlo = BigInt(sorted(r))
    val vhi = BigInt(sorted(math.min(r + 1, n - 1)))
    vlo * scale + (vhi - vlo) * scale * rem / pden
  }

  test("weightedMedian matches the smallest-v-reaching-half-weight rule") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 300).map(i =>
      (s"g${i % 3}", rnd.nextInt(50).toLong, 1L + rnd.nextInt(9).toLong))
    val got = Quantiles.weightedMedian(rows.toDF("g", "v", "w"), "v", "w", "g")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).sortBy(_._1)
      val tw = sorted.map(_._2).sum
      var cum = 0L
      val exp = sorted.collectFirst {
        case (v, w) if { cum += w; cum * 2 >= tw } => v
      }.get
      assert(got(g) == exp, s"group $g")
    }
    // degenerate: single row is its own weighted median
    val one = Quantiles.weightedMedian(
      Seq(("x", 7L, 3L)).toDF("g", "v", "w"), "v", "w", "g")
      .as[(String, Long, Long)].collect().head
    assert(one == (("x", 3L, 7L)))
  }

  test("exactScaled matches a plain-BigInt reference on random groups") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map(i =>
      (s"g${i % 3}", rnd.nextInt(1000).toLong))
    val df = rows.toDF("g", "v")
    val ps = Seq((1, 4), (1, 2), (3, 4), (9, 10))
    val got = Quantiles.exactScaled(df, "v", "g", ps, 1000000L)
      .as[(String, Int, Int, Long)].collect()
      .map { case (g, pn, pd, q) => (g, pn, pd) -> q }.toMap
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for (g <- byG.keys; (pn, pd) <- ps) {
      assert(BigInt(got((g, pn, pd))) == ref(byG(g), pn, pd, 1000000L),
        s"group=$g p=$pn/$pd")
    }
  }

  test("exactScaled endpoints: p=0 is the min, p=1 the max") {
    val df = Seq(("a", 5L), ("a", 1L), ("a", 9L)).toDF("g", "v")
    val got = Quantiles.exactScaled(df, "v", "g", Seq((0, 1), (1, 1)), 100L)
      .as[(String, Int, Int, Long)].collect().map(r => (r._2, r._3) -> r._4).toMap
    assert(got((0, 1)) == 100L)
    assert(got((1, 1)) == 900L)
  }
}
