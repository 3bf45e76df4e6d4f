package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-preparation operators, mirroring the reference's
  * PrepareGraphPieces (giraph-block-app-8
  * .../prepare_graph/PrepareGraphPieces.java) as pure DataFrame → DataFrame
  * functions. Every op is a single declarative plan — Catalyst picks
  * shuffle vs broadcast; none of them collects to the driver.
  */
object Prep {

  /** Drop parallel edges. Ref: PrepareGraphPieces.removeDuplicateEdges
    * (~:138). Keeps the first attr set per (src,dst) deterministically by
    * aggregating with min. */
  def removeDuplicateEdges(edges: DataFrame): DataFrame =
    edges.dropDuplicates("src", "dst")

  /** Add missing reverse edges (unweighted form).
    * Ref: PrepareGraphPieces.makeSymmetricUnweighted (:165-200). */
  def makeSymmetric(edges: DataFrame): DataFrame = {
    val cols = edges.columns
    val rev = edges.withColumnRenamed("src", "tmp_")
      .withColumnRenamed("dst", "src").withColumnRenamed("tmp_", "dst")
      .select(cols.map(col).toSeq: _*)
    edges.union(rev).dropDuplicates("src", "dst")
  }

  /** Keep only edges whose mirror exists.
    * Ref: PrepareGraphPieces.removeAsymEdges (:105-137). */
  def removeAsymEdges(edges: DataFrame): DataFrame = {
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
    edges.join(rev, Seq("src", "dst"), "left_semi")
  }

  /** Drop degree-0 vertices from a vertex frame.
    * Ref: PrepareGraphPieces.removeStandAloneVertices (:279). */
  def removeStandAloneVertices(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val incident = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
    vertices.join(incident, Seq("id"), "left_semi")
  }

  /** Scale out-edge weights so each vertex's outgoing weights sum to 1.
    * Ref: PrepareGraphPieces.normalizeDoubleEdges (:285,328). */
  def normalizeEdgeWeights(edges: DataFrame, weightCol: String = "w"): DataFrame =
    edges.withColumn(weightCol,
      col(weightCol).cast("double") / sum(col(weightCol)).over(Window.partitionBy(col("src"))))

  /** True iff every edge has its mirror.
    * Ref: PrepareGraphPieces.isSymmetricBlock (:412-428). */
  def isSymmetric(edges: DataFrame): Boolean = {
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
    edges.select("src", "dst").join(rev, Seq("src", "dst"), "left_anti").isEmpty
  }

  /** Dedup → symmetrize → (implicitly) drop isolated, as one pipeline.
    * Ref: PrepareGraphPieces.cleanSymmetricUnweightedGraph (:87-95). */
  def cleanSymmetric(edges: DataFrame): DataFrame =
    makeSymmetric(removeDuplicateEdges(edges.select("src", "dst")))
      .filter(col("src") =!= col("dst"))

  /** Merge duplicate vertex values at load time with a caller-chosen
    * aggregate (min/max/last…). Ref: VertexValueCombiner,
    * giraph-core .../graph/DefaultVertexValueCombiner.java. */
  def combineVertexValues(vertices: DataFrame,
                          combine: org.apache.spark.sql.Column): DataFrame =
    vertices.groupBy(col("id")).agg(combine.as("value"))

  /** Contract a graph by a vertex→cluster assignment: edges between
    * clusters with multiplicities, intra-cluster edges dropped.
    * Ref: coarsening utilities,
    * giraph-block-app-8 .../coarsening/CoarseningUtils.java. */
  def coarsen(edges: DataFrame, assignment: DataFrame): DataFrame =
    edges.select("src", "dst")
      .join(assignment.select(col("id").as("src"), col("cluster").as("c_src")), Seq("src"))
      .join(assignment.select(col("id").as("dst"), col("cluster").as("c_dst")), Seq("dst"))
      .filter(col("c_src") =!= col("c_dst"))
      .groupBy(col("c_src").as("src"), col("c_dst").as("dst"))
      .agg(count(lit(1)).as("multiplicity"))
}
