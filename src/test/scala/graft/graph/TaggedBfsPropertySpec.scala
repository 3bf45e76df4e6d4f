package graft.graph

import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph}
import org.apache.spark.graphx.lib.ShortestPaths
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the two-frontier BFS rule (round-11
  * verdict task 6): the round-10 rewrite anti-joins candidates against
  * the last TWO frontiers only — sound iff |dist(u)−dist(v)| ≤ 1 across
  * every edge, i.e. on symmetric graphs (taggedBfs symmetrizes
  * internally since round 11). The fixed-corpus oracles exercise one
  * graph shape; this throws ScalaCheck-random multigraphs (self-loops,
  * parallel edges, disconnected pieces, DIRECTED input — the guard must
  * make orientation irrelevant) at it and demands exact level equality
  * with GraphX ShortestPaths, an RDD-engine implementation we didn't
  * write. Reference analog: the reference's BFS block semantics
  * (BLOCK8 .../algo/BreadthFirstSearch.java:58-123). */
class TaggedBfsPropertySpec extends SparkSpec {
  import spark.implicits._

  test("taggedBfs levels equal GraphX ShortestPaths on random directed multigraphs") {
    val gen = for {
      n <- Gen.choose(6, 36)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val sources = verts.take(3)
      // ours: raw DIRECTED edges — the internal symmetrize guard makes
      // the result the undirected BFS regardless of orientation
      val settled = Algos.taggedBfs(edges.toDF("src", "dst"), sources, maxHops = 64)
      val ours = settled.as[(Long, Long, Long)].collect()
        .map { case (id, tag, lvl) => (id, tag) -> lvl }.toMap
      org.apache.spark.sql.graft.CheckpointBridge.free(settled)
      // theirs: GraphX over the explicitly symmetrized simple graph
      val sym = edges.flatMap(e => Seq(e, e.swap)).distinct
      val gx = ShortestPaths.run(
          GXGraph.fromEdges(
            spark.sparkContext.parallelize(sym.map { case (s, d) => GXEdge(s, d, 1) }, 2),
            defaultValue = 0),
          sources)
        .vertices.collect()
        .flatMap { case (id, dists) =>
          dists.map { case (s, d) => (id, s.toLong) -> d.toLong } }
        .toMap
      ours == gx
    }
    val r = SCTest.check(
      propParams(42L, 8),
      prop)
    assert(r.passed, s"two-frontier vs GraphX: ${r.status}")
  }
}
