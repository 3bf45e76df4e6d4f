package graft.cli

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkSpec, UserProgram}

/** Fixture: max-label propagation written as an EXTERNAL user program —
  * what a reference user would ship in their own jar and name with
  * `run-class --class` (the GiraphRunner `-Computation` analog). Kept
  * deliberately outside the engine's Algos so the test proves the
  * reflective path, not a built-in. */
class MaxLabelUserProgram extends UserProgram {
  def init(spark: SparkSession, edges: DataFrame, opts: Map[String, String]): DataFrame =
    edges.select(col("src").as("id")).union(edges.select(col("dst").as("id")))
      .distinct()
      .select(col("id"), col("id").as("lbl"), lit(true).as("active"))

  def sendMsg(joined: DataFrame): DataFrame =
    joined.select(col("dst").as("id"), col("lbl").as("msg"))

  override def combineMsg: Column = max(col("msg"))

  def vprog(verts: DataFrame, msgs: DataFrame): DataFrame = {
    val better = col("msg").isNotNull && col("msg") > col("lbl")
    verts.join(msgs, Seq("id"), "left").select(
      col("id"),
      when(better, col("msg")).otherwise(col("lbl")).as("lbl"),
      coalesce(better, lit(false)).as("active"))
  }
}

/** Fixture for the NO-COMBINER mode (the reference's default — raw
  * message iterable): each vertex takes the MODE of its neighbors'
  * labels (most frequent, ties to the smallest) — a genuinely
  * non-combinable reduction (needs the full multiset, like the
  * reference's VerifyMessage needs every message). `combineMsg` is NOT
  * overridden, so `vprog` receives `msg` as the raw message array. */
class NeighborModeUserProgram extends UserProgram {
  def init(spark: SparkSession, edges: DataFrame, opts: Map[String, String]): DataFrame =
    edges.select(col("src").as("id")).union(edges.select(col("dst").as("id")))
      .distinct()
      .select(col("id"), col("id").as("lbl"), lit(true).as("active"))

  def sendMsg(joined: DataFrame): DataFrame =
    joined.select(col("dst").as("id"), col("lbl").as("msg"))

  // one superstep: receive all neighbor labels, take the mode, halt
  def vprog(verts: DataFrame, msgs: DataFrame): DataFrame =
    verts.join(msgs, Seq("id"), "left").select(
      col("id"),
      coalesce(
        // maximize (count, -label): most frequent neighbor label, ties
        // to the SMALLEST label — order-insensitive over the raw array
        -expr("array_max(transform(array_distinct(msg), " +
          "x -> struct(size(filter(msg, y -> y = x)) as c, -x as neg)))").getField("neg"),
        col("lbl")).as("lbl"),
      lit(false).as("active"))

  override def maxSupersteps: Int = 5
}

class UserProgramSpec extends SparkSpec {

  // two components: {1,2,3,9} and {5,6} — max labels 9 and 6
  private lazy val edgesPath: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_userprog")
    val path = s"$tmp/edges"
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L))
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
      .write.mode("overwrite").parquet(path)
    path
  }

  test("run-class reflectively loads a UserProgram and drives it through Pregel") {
    val out = GraftRunner.execute(spark, "run-class",
      Map("class" -> "graft.cli.MaxLabelUserProgram", "edges" -> edgesPath))
    val got = out.select("id", "lbl").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 9L), (2L, 9L), (3L, 9L), (5L, 6L), (6L, 6L), (9L, 9L)))
  }

  // path 1-2-3 plus star 10-(7,8,9) with a 7-8 chord: hand-computed
  // neighbor modes N(1)={2}→2, N(2)={1,3}→1, N(3)={2}→2, N(7)={10,8}→8,
  // N(8)={10,7}→7, N(9)={10}→10, N(10)={7,8,9}→7
  private lazy val modeEdgesPath: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_userprog_mode")
    val path = s"$tmp/edges"
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 7L), (10L, 8L), (10L, 9L), (7L, 8L))
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
      .write.mode("overwrite").parquet(path)
    path
  }

  test("a no-combiner user program receives the raw message list (reference default mode)") {
    val out = GraftRunner.execute(spark, "run-class",
      Map("class" -> "graft.cli.NeighborModeUserProgram", "edges" -> modeEdgesPath))
    val got = out.select("id", "lbl").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L), (2L, 1L), (3L, 2L), (7L, 8L), (8L, 7L),
      (9L, 10L), (10L, 7L)))
  }

  test("ecc/neighborhood CLI actions symmetrize DIRECTED input themselves") {
    // the r10 two-frontier anti-join is only sound on symmetric graphs
    // (|dist(u)−dist(v)| ≤ 1 across an edge) — the runner must not trust
    // --symmetric for these algos. Fixture: a directed 3-cycle, whose
    // raw form violates the invariant; correct symmetrized answers are
    // asserted exactly.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_directed")
    val path = s"$tmp/edges"
    Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
      .write.mode("overwrite").parquet(path)
    val ecc = GraftRunner.execute(spark, "ecc",
      Map("edges" -> path, "source" -> "1"))
    val r = ecc.collect().head
    // undirected triangle from source 1: ecc = 1, 3 reached, Σdist = 2
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 1L, 3L, 2L)), ecc.collect().mkString(", "))
    val nh = GraftRunner.execute(spark, "neighborhood",
      Map("edges" -> path, "samplemod" -> "1", "maxh" -> "2"))
    val got = nh.orderBy("h").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    // all 3 sources: N(0) = 3 pairs, N(1) = 3 + 6, N(2) = 9 (complete)
    assert(got == Seq((0L, 3L), (1L, 9L), (2L, 9L)), got.toString)
    // default-source rule (round-11 advice fix): the default is the min
    // VERTEX over both endpoints, not min(src) — on a graph whose min
    // vertex appears only as a DESTINATION the old rule could never
    // pick it, and the default changed with the input's orientation.
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_dstonly")
    val path2 = s"$tmp2/edges"
    // vertex 1 appears only as dst; min(src) = 2
    Seq((2L, 1L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
      .write.mode("overwrite").parquet(path2)
    val d = GraftRunner.execute(spark, "ecc", Map("edges" -> path2)).collect().head
    // source must be vertex 1; undirected path 1-2-3-4: ecc(1) = 3,
    // 4 reached, Σdist = 1+2+3 = 6
    assert((d.getLong(0), d.getLong(1), d.getLong(2), d.getLong(3)) ==
      ((1L, 3L, 4L, 6L)), d.toString)
  }

  test("structure-panel CLI actions run end-to-end on an edge file") {
    val rc = GraftRunner.execute(spark, "richclub",
      Map("edges" -> edgesPath, "ks" -> "1"))
    assert(rc.columns.toSeq == Seq("k", "n_k", "e_k", "phi_e6"))
    assert(rc.count() == 1)
    val pe = GraftRunner.execute(spark, "peel",
      Map("edges" -> edgesPath, "rounds" -> "3"))
    assert(pe.count() == 4) // 3 rounds + survivors row
    val br = GraftRunner.execute(spark, "bridges", Map("edges" -> edgesPath))
    // both fixture components are trees: every edge is a local bridge
    val r = br.collect().head
    assert(r.getLong(0) == r.getLong(1) && r.getLong(2) == 1000000L)
  }

  test("docs-side actions route through the docs branch (PipelineAlgos)") {
    // bm25 / winnow take --docs, not --edges: a routing regression sends
    // them into the edges branch where opts("docs") is missing and the
    // dispatch dies on "unknown algo" — this pins the fix
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val w = GraftRunner.execute(spark, "winnow", Map("docs" -> docs))
    assert(w.columns.toSeq == Seq("doc_id", "n_kgrams", "n_selected", "fp_min"))
    assert(w.count() > 0)
    val b = GraftRunner.execute(spark, "bm25",
      Map("docs" -> docs, "terms" -> "the,and", "k" -> "5"))
    assert(b.count() > 0)
  }

  test("salsa and squares CLI actions run on an edge file") {
    val sa = GraftRunner.execute(spark, "salsa",
      Map("edges" -> edgesPath, "iters" -> "2"))
    assert(sa.columns.toSeq == Seq("id", "auth", "hub"))
    assert(sa.count() == 6)
    val sq = GraftRunner.execute(spark, "squares", Map("edges" -> edgesPath))
    // tree fixture: no 4-cycles
    assert(sq.select("n_squares").collect().head.getLong(0) == 0L)
  }

  test("generic query action runs any declared query over a table dir") {
    val out = GraftRunner.execute(spark, "query",
      Map("name" -> "q01_agg", "sf" -> "/root/testdata/sf0.001"))
    assert(out.count() > 0)
    val g = GraftRunner.execute(spark, "query",
      Map("name" -> "q_graph_degrees", "sf" -> "/root/testdata/sf0.001"))
    assert(g.count() > 0)
  }

  test("run-class rejects a class that is not a UserProgram") {
    intercept[ClassCastException] {
      GraftRunner.execute(spark, "run-class",
        Map("class" -> "java.lang.Object", "edges" -> edgesPath))
    }
  }
}
