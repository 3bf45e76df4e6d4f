package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Public facade of the engine — the Spark-native analog of
  * `GiraphConfiguration` + `GiraphJob` (SURVEY §3.2): hold the graph as a
  * pair of frames, offer the prep/algorithm/Pregel surface as methods.
  *
  * vertices: (id BIGINT, …values…); edges: (src BIGINT, dst BIGINT, …).
  * Vertices may be Nil — they are implied by edge endpoints (the
  * reference's edge-only input with vertex auto-creation,
  * CORE/graph/DefaultVertexResolver.java:37-140).
  */
final case class PropertyGraph(vertices: DataFrame, edges: DataFrame) {

  /** Vertices implied by edges merged with explicit vertices (vertex
    * auto-creation semantics). */
  def allVertexIds: DataFrame =
    Algos.verticesOf(edges).unionByName(vertices.select(col("id"))).distinct()

  def symmetrize: PropertyGraph = copy(edges = Prep.makeSymmetric(edges))
  def dedupEdges: PropertyGraph = copy(edges = Prep.removeDuplicateEdges(edges))
  def normalized(w: String = "w"): PropertyGraph = copy(edges = Prep.normalizeEdgeWeights(edges, w))
  def cleanSymmetric: PropertyGraph = copy(edges = Prep.cleanSymmetric(edges))

  /** Graph mutation between supersteps (SURVEY §2.3): apply buffered
    * add/remove requests in the reference's resolver order
    * (DefaultVertexResolver.java:37-49 — remove edges → remove vertices →
    * add vertices → add edges). */
  def mutated(addVertices: Option[DataFrame] = None,
              removeVertexIds: Option[DataFrame] = None,
              addEdges: Option[DataFrame] = None,
              removeEdges: Option[DataFrame] = None): PropertyGraph = {
    var e = edges
    removeEdges.foreach(r => e = e.join(r.select("src", "dst"), Seq("src", "dst"), "left_anti"))
    var v = vertices
    removeVertexIds.foreach { r =>
      v = v.join(r.select("id"), Seq("id"), "left_anti")
      e = e.join(r.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(r.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .select(edges.columns.map(col).toSeq: _*)
    }
    addVertices.foreach(a => v = v.unionByName(a).dropDuplicates("id"))
    addEdges.foreach(a => e = e.unionByName(a))
    PropertyGraph(v, e)
  }

  /** Placement partitioning from a mapping side-input — the reference's
    * MappingInputFormat (CORE/io/MappingInputFormat.java:46) +
    * LongByteMappingStore (CORE/mapping/LongByteMappingStore.java) +
    * LongMappingStorePartitionerFactory
    * (CORE/partition/LongMappingStorePartitionerFactory.java:getPartition).
    * `mapping` = (id, bucket): broadcast (the reference materializes it in
    * every worker's LocalData), joined onto vertices and — by src, the
    * message-routing key — onto edges, then both frames are
    * placed with partition = bucket mod `numPartitions` — the exact
    * `getPartition` contract (with `numPartitions` ≥ #buckets every
    * bucket gets its own partition). Placement is an explicit
    * `Partitioner` over the bucket key: one RDD pass at load time (the
    * only point RDDs appear in the engine — hash/range repartition
    * cannot express identity placement), exactly when the reference
    * builds its mapping store. Unmapped ids group under bucket −1. */
  def partitionByMapping(mapping: DataFrame, numPartitions: Int): PropertyGraph = {
    val m = broadcast(mapping.select(col("id"), col("bucket")))
    val v = vertices.join(m, Seq("id"), "left")
      .withColumn("bucket", coalesce(col("bucket"), lit(-1L)))
    val e = edges.join(m.select(col("id").as("src"), col("bucket")), Seq("src"), "left")
      .withColumn("bucket", coalesce(col("bucket"), lit(-1L)))
    PropertyGraph(PropertyGraph.placeByBucket(v, numPartitions),
      PropertyGraph.placeByBucket(e, numPartitions))
  }

  def degrees: DataFrame = Algos.degrees(edges)
  def wcc: DataFrame = Algos.wcc(edges)
  def scc: DataFrame = Algos.scc(edges)
  def pagerank(iters: Int, damping: Double = 0.85): DataFrame =
    Algos.pagerank(edges, iters, damping)
  def sssp(source: Long): DataFrame = Algos.sssp(edges, source)
  def bfs(sources: Seq[Long]): DataFrame = Algos.bfs(edges, sources)
  def independentSet: DataFrame = Algos.independentSet(edges)

  /** Raw Pregel loop over this graph (SURVEY §2.3-2.6). */
  def pregel(init: DataFrame, sendMsg: DataFrame => DataFrame, combineMsg: Column,
             vprog: (DataFrame, DataFrame) => DataFrame,
             opts: PregelOptions = PregelOptions()): DataFrame =
    Pregel.run(init, edges, sendMsg, combineMsg, vprog, opts)
}

object PropertyGraph {
  def fromEdges(edges: DataFrame): PropertyGraph = {
    val spark = edges.sparkSession
    PropertyGraph(Algos.verticesOf(edges), edges)
  }

  /** partition index = bucket mod n (floorMod: bucket −1 = unmapped ids
    * land in the last partition), per
    * LongMappingStorePartitionerFactory.getPartition. */
  private class BucketPartitioner(n: Int) extends org.apache.spark.Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int =
      math.floorMod(key.asInstanceOf[Long], n.toLong).toInt
  }

  private def placeByBucket(df: DataFrame, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val placed = df.rdd.keyBy(_.getAs[Long]("bucket"))
      .partitionBy(new BucketPartitioner(numPartitions))
      .values
    spark.createDataFrame(placed, df.schema).drop("bucket")
  }
}
