package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrepSpec extends SparkSpec {
  import spark.implicits._

  test("makeSymmetric adds exactly the missing mirrors") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val s = Prep.makeSymmetric(e)
    assert(s.count() == 4)
    assert(Prep.isSymmetric(s))
  }

  test("removeAsymEdges keeps only bidirectional pairs") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val got = Prep.removeAsymEdges(e).orderBy("src").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 1L)))
  }

  test("removeStandAloneVertices drops degree-0 ids") {
    val v = Seq(1L, 2L, 9L).toDF("id")
    val e = Seq((1L, 2L)).toDF("src", "dst")
    assert(Prep.removeStandAloneVertices(v, e).as[Long].collect().toSet == Set(1L, 2L))
  }

  test("normalizeEdgeWeights makes out-weights sum to 1") {
    val e = Seq((1L, 2L, 1L), (1L, 3L, 3L), (2L, 3L, 5L)).toDF("src", "dst", "w")
    val sums = Prep.normalizeEdgeWeights(e).groupBy("src").agg(sum("w").as("s"))
      .select("s").as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("property: makeSymmetric is idempotent and symmetric (seeded random graphs)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val pairs = Seq.fill(30)((rnd.nextInt(10).toLong, rnd.nextInt(10).toLong))
      val e = pairs.toDF("src", "dst")
      val s = Prep.makeSymmetric(e)
      assert(Prep.isSymmetric(s))
      assert(Prep.makeSymmetric(s).count() == s.count())
    }
  }

  test("coarsen contracts clusters and counts multiplicities") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val asg = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L)).toDF("id", "cluster")
    val got = Prep.coarsen(e, asg).orderBy("src", "dst")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 20L, 2L))) // 1→3 and 2→3 contract; 3→4 intra
  }

  test("combineVertexValues merges duplicate ids") {
    val v = Seq((1L, 5.0), (1L, 3.0), (2L, 7.0)).toDF("id", "value")
    val got = Prep.combineVertexValues(v, min(col("value")))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3.0), (2L, 7.0)))
  }

  test("saltedJoin equals the plain join on a skewed key") {
    val skewed = (Seq.fill(200)((1L, "hot")) ++ Seq((2L, "cold"), (3L, "cold")))
      .toDF("k", "payload")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "unused")).toDF("k", "side")
    val plain = skewed.join(dim, Seq("k"))
    val salted = graft.graph.Skew.saltedJoin(skewed, dim, "k", salt = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("cleanSymmetric drops self-loops and parallel edges") {
    val e = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val c = Prep.cleanSymmetric(e)
    assert(c.filter(col("src") === col("dst")).count() == 0)
    assert(c.count() == 4) // (1,2),(2,1),(2,3),(3,2)
  }
}
