package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graph-mutation semantics replicated from the reference's resolver
  * (DefaultVertexResolver.java:37-49 order: remove edges → remove
  * vertices → add vertices → add edges; exercised there by
  * SimpleMutateGraphComputation). */
class PropertyGraphSpec extends SparkSpec {
  import spark.implicits._

  private def graph = PropertyGraph(
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "value"),
    Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"))

  test("removing a vertex removes its incident edges") {
    val g = graph.mutated(removeVertexIds = Some(Seq(2L).toDF("id")))
    assert(g.vertices.select("id").as[Long].collect().toSet == Set(1L, 3L))
    assert(g.edges.as[(Long, Long)].collect().toSeq == Seq((3L, 1L)))
  }

  test("add/remove edges and vertices compose in resolver order") {
    val g = graph.mutated(
      addVertices = Some(Seq((4L, 40.0), (1L, 99.0)).toDF("id", "value")),
      removeEdges = Some(Seq((1L, 2L)).toDF("src", "dst")),
      addEdges = Some(Seq((3L, 4L)).toDF("src", "dst")))
    // duplicate-id add does not clobber the existing vertex
    assert(g.vertices.count() == 4)
    assert(g.edges.orderBy("src").as[(Long, Long)].collect().toSeq ==
      Seq((2L, 3L), (3L, 1L), (3L, 4L)))
  }

  test("vertices implied by edges are auto-created (implicit creation)") {
    // edge to an id with no explicit vertex row — the reference creates
    // the vertex on message/edge arrival (DefaultVertexResolver)
    val g = PropertyGraph(
      Seq((1L, 10.0)).toDF("id", "value"),
      Seq((1L, 7L)).toDF("src", "dst"))
    assert(g.allVertexIds.as[Long].collect().toSet == Set(1L, 7L))
  }

  test("facade algorithms run over the graph") {
    val pr = graph.pagerank(3)
    assert(math.abs(pr.agg(sum("pr")).first().getDouble(0) - 1.0) < 1e-9)
    assert(graph.symmetrize.wcc.select("component").distinct().count() == 1)
  }

  test("partitionByMapping co-locates each bucket and preserves results") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 1L), (2L, 5L), (7L, 8L)).toDF("src", "dst")
    val mapping = (1L to 8L).map(i => (i, i % 3)).toDF("id", "bucket")
    val g = PropertyGraph.fromEdges(edges)
    val p = g.partitionByMapping(mapping, numPartitions = 3)
    // placement: every partition holds ids of exactly one bucket, and all
    // 3 buckets are separated (one partition per bucket)
    val placement = p.vertices
      .select(spark_partition_id().as("pid"), col("id"))
      .join(mapping, Seq("id"))
      .groupBy("pid").agg(countDistinct("bucket").as("nb"))
      .as[(Int, Long)].collect().toMap
    assert(placement.size == 3)
    assert(placement.values.forall(_ == 1L))
    // results are placement-invariant
    val base = g.symmetrize.wcc.orderBy("id").as[(Long, Long)].collect().toSeq
    val part = p.symmetrize.wcc.orderBy("id").as[(Long, Long)].collect().toSeq
    assert(part == base)
  }
}
