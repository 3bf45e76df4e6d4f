package graft.graph

import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph}
import org.apache.spark.graphx.lib.ShortestPaths
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Generators

/** GraphX as an independent second oracle (SURVEY §5 test plan): the
  * same algorithms computed by a completely different engine path
  * (RDD-based Pregel) must agree with our DataFrame plans on a
  * generated graph. The DuckDB oracles prove arithmetic parity; this
  * proves ALGORITHMIC parity against an implementation we didn't write.
  */
class GraphXParitySpec extends SparkSpec {
  import spark.implicits._

  // deterministic small-world graph, symmetrized: 300 vertices, k=3
  private lazy val edgesDf = Prep.makeSymmetric(
    Generators.wattsStrogatz(spark, n = 300, k = 3, betaPermille = 200, seed = 11))
    .persist()

  private lazy val gxGraph: GXGraph[Int, Int] = {
    val edgeRdd = edgesDf.select("src", "dst").as[(Long, Long)].rdd
      .map { case (s, d) => GXEdge(s, d, 1) }
    GXGraph.fromEdges(edgeRdd, defaultValue = 0)
  }

  test("connected components agree with GraphX") {
    val ours = Algos.wcc(edgesDf).as[(Long, Long)].collect().toMap
    val gx = gxGraph.connectedComponents().vertices.collect().toMap
    assert(ours.size == gx.size)
    // both label a component with its min vertex id
    ours.foreach { case (id, comp) => assert(gx(id) == comp, s"vertex $id") }
  }

  test("BFS hop levels agree with GraphX ShortestPaths") {
    val source = 0L
    val ours = Algos.bfs(edgesDf, Seq(source)).as[(Long, Long)].collect().toMap
    val gx = ShortestPaths.run(gxGraph, Seq(source)).vertices.collect()
      .flatMap { case (id, m) => m.get(source).map(id -> _.toLong) }.toMap
    assert(ours == gx)
  }

  test("triangle count agrees with GraphX TriangleCount") {
    // our count takes canonical u<v pairs; GraphX counts per-vertex
    // memberships over the canonicalized graph — Σ/3 = total triangles
    val pairs = edgesDf.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v")).distinct()
    val ours = Algos.triangleCount(pairs).first().getLong(0)
    val gxTotal = org.apache.spark.graphx.lib.TriangleCount
      .run(gxGraph).vertices.map(_._2.toLong).reduce(_ + _) / 3
    assert(ours == gxTotal && ours > 0)
  }

  test("pagerank agrees with GraphX staticPageRank up to the 1/n scaling") {
    // our pr solves pr' = 0.15/n + 0.85·Σ pr/deg (dangling term 0 on a
    // symmetric graph); GraphX staticPageRank solves the same linear map
    // scaled by n (starts at 1.0, teleport 0.15) — so n·ours must equal
    // GraphX at every iteration count
    val iters = 5
    val n = 300.0
    val ours = Algos.pagerank(edgesDf, iterations = iters)
      .as[(Long, Double)].collect().toMap
    val gx = gxGraph.staticPageRank(iters, resetProb = 0.15).vertices.collect().toMap
    ours.foreach { case (id, pr) =>
      assert(math.abs(pr * n - gx(id)) < 1e-8, s"vertex $id: ${pr * n} vs ${gx(id)}")
    }
  }

  test("katz agrees with a GraphX Pregel replay of the integer recurrence") {
    // same floored-BIGINT contract, computed by the RDD engine path:
    // x' = S + (Σ in-x) div A — exact equality required, no tolerance
    val rounds = 4
    val scale = 1000000L
    val atten = 16L
    val ours = Algos.katz(edgesDf, rounds, attenDiv = atten, scale = scale)
      .as[(Long, Long)].collect().toMap
    var xs = gxGraph.mapVertices((_, _) => scale)
    for (_ <- 1 to rounds) {
      val sums = xs.aggregateMessages[Long](
        tc => tc.sendToDst(tc.srcAttr), _ + _)
      xs = xs.outerJoinVertices(sums) { (_, _, s) =>
        scale + s.getOrElse(0L) / atten
      }
    }
    val gx = xs.vertices.collect().toMap
    assert(ours.size == gx.size && ours.nonEmpty)
    ours.foreach { case (id, x) => assert(gx(id) == x, s"vertex $id") }
  }
}
