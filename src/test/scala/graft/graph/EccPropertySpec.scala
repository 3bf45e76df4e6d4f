package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the distance-centrality aggregation
  * stack: eccentricity / reach count / closeness numerator AND the
  * exact harmonic numerator, per source, on ScalaCheck-random DIRECTED
  * multigraphs vs an in-memory BFS over the symmetrized graph.
  * TaggedBfsPropertySpec pins the hop levels themselves (vs GraphX);
  * this pins what rides on top — the per-tag max/count/sum aggregation
  * and the internal symmetrize guard (directed input is the regime that
  * was silently wrong before round 11) — all exact integers. */
class EccPropertySpec extends SparkSpec {
  import spark.implicits._

  /** BFS over the symmetrized adjacency; returns hop levels from s. */
  private def bfsRef(edges: Seq[(Long, Long)], s: Long): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (x, es) => x -> es.map(_._2).distinct }
    val d2 = mutable.Map(s -> 0L)
    var layer = List(s)
    var lvl = 0L
    while (layer.nonEmpty) {
      lvl += 1
      layer = layer.flatMap(u => adj.getOrElse(u, Nil))
        .distinct.filterNot(d2.contains)
      layer.foreach(v => d2(v) = lvl)
    }
    d2.toMap
  }

  test("eccentricities + harmonic match in-memory BFS on random digraphs") {
    val gen = for {
      n <- Gen.choose(4, 30)
      m <- Gen.choose(n / 2, 2 * n) // sparse → long paths, disconnects
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val sources = verts.take(3)
      val df = edges.toDF("src", "dst")
      val eccRows = Algos.eccentricities(df, sources)
        .as[(Long, Long, Long, Long)].collect()
      val gotEcc = eccRows.map { case (s, e, n, ds) => s -> (e, n, ds) }.toMap
      val harRows = Algos.harmonicCentrality(df, sources)
        .select("source", "harmonic_num", "n_reached")
        .as[(Long, Long, Long)].collect()
      val gotHar = harRows.map { case (s, hn, n) => s -> (hn, n) }.toMap
      val ok = eccRows.length == gotEcc.size && harRows.length == gotHar.size &&
        sources.forall { s =>
        val d = bfsRef(edges, s)
        val wantEcc = (d.values.max, d.size.toLong, d.values.sum)
        val wantHar = (d.values.filter(_ > 0).map(Algos.HarmonicLcm / _).sum,
          d.size.toLong)
        val hit = gotEcc.get(s).contains(wantEcc) && gotHar.get(s).contains(wantHar)
        if (!hit) System.err.println(
          s"MISMATCH s=$s edges=$edges\n gotEcc=${gotEcc.get(s)} wantEcc=$wantEcc" +
          s"\n gotHar=${gotHar.get(s)} wantHar=$wantHar")
        hit
      }
      ok
    }
    val r = SCTest.check(
      propParams(1225L, 10),
      prop)
    assert(r.passed, s"eccentricities/harmonic vs in-memory BFS: ${r.status}")
  }
}
