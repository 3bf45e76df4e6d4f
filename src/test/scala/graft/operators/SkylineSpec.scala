package graft.operators

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** O(n²) reference: weak dominance on distinct pairs. */
  private def ref(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val d = pts.distinct
    d.filterNot { case (p, s) =>
      d.exists { case (p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }
    }.toSet
  }

  test("skyline matches brute-force dominance on random points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val got = Skyline.skyline(pts.toDF("p", "s"), "p", "s")
      .select("minv", "maxv").as[(Long, Long)].collect().toSet
    assert(got === ref(pts))
  }

  test("skyline keeps duplicate counts and drops dominated ties") {
    // (1,5) dominates (1,4) and (2,5); (0,3) survives (cheaper, smaller);
    // duplicate (1,5) rows collapse to one skyline row with n_rows = 2.
    val pts = Seq((1L, 5L), (1L, 5L), (1L, 4L), (2L, 5L), (0L, 3L), (3L, 6L))
    val got = Skyline.skyline(pts.toDF("p", "s"), "p", "s")
      .select("minv", "maxv", "n_rows").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === Set((0L, 3L, 1L), (1L, 5L, 2L), (3L, 6L, 1L)))
  }

  test("bucketed two-stage pass agrees with a single global pass") {
    val rnd = new scala.util.Random(13)
    val pts = Seq.fill(600)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val many = Skyline.skyline(pts.toDF("p", "s"), "p", "s", buckets = 64)
      .select("minv", "maxv").as[(Long, Long)].collect().toSet
    val one = Skyline.skyline(pts.toDF("p", "s"), "p", "s", buckets = 1)
      .select("minv", "maxv").as[(Long, Long)].collect().toSet
    assert(many === one)
    assert(many === ref(pts))
  }
}
