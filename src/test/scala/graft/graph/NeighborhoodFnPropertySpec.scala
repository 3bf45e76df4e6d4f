package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the exact neighborhood function N(h):
  * random directed multigraphs, sampleMod = 1 (every vertex a source),
  * against in-memory BFS balls over the symmetrized graph —
  * N(h) = Σ_s |{v : d(s,v) ≤ h}| for h = 0..maxH. Exercises the
  * settled-pair anti-join cascade (a pair must be counted at its FIRST
  * hop only, never re-settled via a longer path) and the internal
  * symmetrize on directed input. The size gate stays out of the way
  * (default maxPairs is generous); its planted-knob behavior has its
  * own test. */
class NeighborhoodFnPropertySpec extends SparkSpec {
  import spark.implicits._

  private def nhRef(edges: Seq[(Long, Long)], maxH: Int): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (x, es) => x -> es.map(_._2).distinct }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val dists = verts.map { s =>
      val d = mutable.Map(s -> 0L)
      var layer = List(s); var lvl = 0L
      while (layer.nonEmpty) {
        lvl += 1
        layer = layer.flatMap(u => adj.getOrElse(u, Nil))
          .distinct.filterNot(d.contains)
        layer.foreach(v => d(v) = lvl)
      }
      d
    }
    (0 to maxH).map { h =>
      h.toLong -> dists.map(_.values.count(_ <= h).toLong).sum
    }.toMap
  }

  test("neighborhoodFunction equals in-memory BFS balls on random digraphs") {
    val gen = for {
      n <- Gen.choose(3, 20)
      m <- Gen.choose(n / 2, 2 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val rows = Algos.neighborhoodFunction(
          edges.toDF("src", "dst"), maxH = 3, sampleMod = 1L)
        .as[(Long, Long)].collect()
      val got = rows.toMap
      val want = nhRef(edges, maxH = 3)
      val ok = rows.length == got.size && got == want
      if (!ok) {
        System.err.println(s"MISMATCH edges=$edges\n got=$got\n want=$want")
      }
      ok
    }
    val r = SCTest.check(
      propParams(1228L, 10),
      prop)
    assert(r.passed, s"neighborhoodFunction vs in-memory BFS balls: ${r.status}")
  }
}
