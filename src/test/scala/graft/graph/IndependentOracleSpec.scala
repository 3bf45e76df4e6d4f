package graft.graph

import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Generators

/** Structurally INDEPENDENT oracles for the operator families whose
  * DuckDB oracles are replay-twins of the engine arithmetic (round-6
  * verdict "What's wrong #3"): a replay hash-match proves engine ≡
  * oracle, not absolute truth. Here each family is checked against a
  * verifier that shares NO formulation with the engine —
  *
  *  - SCC against GraphX's RDD-Pregel `StronglyConnectedComponents`
  *    (component PARTITIONS compared, so no label-convention coupling);
  *  - betweenness against the closed forms on path and star graphs
  *    (bc(v_i) = 2·i·(n−1−i) on a path; (n−1)(n−2) at a star center);
  *  - k-truss against a from-scratch in-memory adjacency-set peeler;
  *  - SALSA against a from-scratch dense double iteration;
  *  - BM25 against a from-scratch token-map scorer (same exact-integer
  *    contract, independently written).
  */
class IndependentOracleSpec extends SparkSpec {
  import spark.implicits._

  // --- SCC vs GraphX ----------------------------------------------------

  test("SCC partitions agree with GraphX StronglyConnectedComponents") {
    // directed fixture with known variety: a 30-ring (one big SCC), two
    // 2-cycles, a pure chain (singletons), cross edges, and a
    // hash-derived tangle on 60..99 (whatever SCCs it forms, GraphX is
    // the referee)
    val ring = (0 until 30).map(i => (i.toLong, ((i + 1) % 30).toLong))
    val twoCycles = Seq((30L, 31L), (31L, 30L), (32L, 33L), (33L, 32L))
    val chain = (34 until 59).map(i => (i.toLong, (i + 1).toLong))
    val cross = Seq((5L, 40L), (17L, 50L), (58L, 60L))
    val tangle = (60 until 100).map(i => (i.toLong, ((i * 13 + 7) % 40 + 60).toLong))
      .filter { case (a, b) => a != b }
    val edges = (ring ++ twoCycles ++ chain ++ cross ++ tangle).distinct
    val df = edges.toDF("src", "dst")

    val ours = Algos.scc(df).as[(Long, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    val gx = org.apache.spark.graphx.lib.StronglyConnectedComponents
      .run(GXGraph.fromEdges(
        spark.sparkContext.parallelize(edges.map { case (s, d) => GXEdge(s, d, 1) }), 0),
        numIter = 60)
      .vertices.collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(ours == gx,
      s"SCC partitions differ: ours=${ours.size} comps, graphx=${gx.size} comps")
    assert(ours.exists(_.size == 30), "the 30-ring SCC is missing")
  }

  // --- betweenness vs closed forms --------------------------------------

  test("betweenness matches the path-graph closed form 2·i·(n−1−i)") {
    val n = 40 // diameter n−1: the worst case for the tagged BFS depth
    val sym = (0 until n - 1).flatMap(i =>
      Seq((i.toLong, (i + 1).toLong), ((i + 1).toLong, i.toLong))).toDF("src", "dst")
    val bc = Algos.betweenness(sym, (0L until n.toLong), maxHops = n + 2)
      .as[(Long, Double)].collect().toMap
    (0 until n).foreach { i =>
      val expected = 2.0 * i * (n - 1 - i) // ordered (s,t) pairs through v_i
      val got = bc.getOrElse(i.toLong, 0.0)
      assert(math.abs(got - expected) < 1e-6, s"v$i: $got vs $expected")
    }
  }

  test("betweenness matches the star-graph closed form (n−1)(n−2) at the center") {
    val n = 200 // center 0, leaves 1..n-1
    val sym = (1 until n).flatMap(i =>
      Seq((0L, i.toLong), (i.toLong, 0L))).toDF("src", "dst")
    val bc = Algos.betweenness(sym, (0L until n.toLong), maxHops = 4)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(bc.getOrElse(0L, 0.0) - (n - 1.0) * (n - 2.0)) < 1e-6)
    (1 until n).foreach(i =>
      assert(math.abs(bc.getOrElse(i.toLong, 0.0)) < 1e-9, s"leaf $i"))
  }

  // --- k-truss vs an in-memory peeler -----------------------------------

  private def trussReferee(pairs: Set[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    def supports(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = es.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).map { case (x, ys) => x -> ys.map(_._2).toSet }
      es.map { case (u, v) => (u, v) -> (adj(u) & adj(v)).size.toLong }.toMap
    }
    var edges = pairs
    var sup = supports(edges)
    var done = false
    while (!done) {
      val kept = sup.filter(_._2 >= k - 2).keySet
      if (kept == edges) done = true
      else { edges = kept; sup = supports(edges) }
    }
    sup
  }

  test("k-truss agrees with the in-memory adjacency-set peeler (k=3 and k=4)") {
    val pairsDf = Prep.makeSymmetric(
        Generators.wattsStrogatz(spark, n = 200, k = 3, betaPermille = 200, seed = 7))
      .filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v")).distinct()
    val pairs = pairsDf.as[(Long, Long)].collect().toSet
    Seq(3, 4).foreach { k =>
      val ours = Algos.kTruss(pairsDf, k).as[(Long, Long, Long)].collect()
        .map { case (u, v, s) => (u, v) -> s }.toMap
      val ref = trussReferee(pairs, k)
      assert(ours == ref, s"k=$k: ${ours.size} engine edges vs ${ref.size} referee edges")
    }
  }

  // --- SALSA vs a dense double iteration --------------------------------

  test("SALSA agrees with a from-scratch dense iteration") {
    val edges = (0 until 40).map(i => (i.toLong, ((i * 7 + 3) % 40).toLong))
      .filter { case (a, b) => a != b } ++ Seq((1L, 5L), (5L, 1L), (2L, 9L), (9L, 17L))
    val df = edges.distinct.toDF("src", "dst")
    val iters = 5
    val ours = Algos.salsa(df, iters).as[(Long, Double, Double)].collect()
      .map { case (id, a, h) => id -> (a, h) }.toMap

    // referee: adjacency maps + per-round normalization, plain Scala
    val e = edges.distinct
    val verts = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val od = e.groupBy(_._1).map { case (v, xs) => v -> xs.size.toDouble }
    val idg = e.groupBy(_._2).map { case (v, xs) => v -> xs.size.toDouble }
    var h = verts.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    (0 until iters).foreach { _ =>
      val araw = verts.map(v =>
        v -> e.filter(_._2 == v).map { case (s, _) => h(s) / od(s) }.sum).toMap
      val as = araw.values.sum
      a = araw.map { case (v, x) => v -> x / as }
      val hraw = verts.map(v =>
        v -> e.filter(_._1 == v).map { case (_, d) => a(d) / idg(d) }.sum).toMap
      val hs = hraw.values.sum
      h = hraw.map { case (v, x) => v -> x / hs }
    }
    verts.foreach { v =>
      val (ea, eh) = ours(v)
      assert(math.abs(ea - a(v)) < 1e-9 && math.abs(eh - h(v)) < 1e-9, s"vertex $v")
    }
  }

  // --- BM25 vs a from-scratch token-map scorer --------------------------

  test("BM25 top-15 agrees with a from-scratch integer scorer") {
    val sf = "/root/testdata/sf0.001"
    val terms = Seq("spark", "vector", "merge")
    val ours = graft.pipeline.Retrieval.bm25(
        graft.Tables(spark, sf).documents, terms, k = 15)
      .as[(Long, Long, Long)].collect().toSeq

    val docs = graft.Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val toks: Seq[(Long, Array[String])] =
      docs.toSeq.map { case (id, t) => id -> t.trim.split("\\s+") }
    val dl = toks.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val nDocs = dl.size.toLong
    val nToks = dl.values.sum
    val tf: Map[(Long, String), Long] = toks.flatMap { case (id, ts) =>
      ts.filter(terms.contains).map(tk => (id, tk))
    }.groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    val dfm: Map[String, Long] = tf.keys.toSeq.groupBy(_._2)
      .map { case (t, xs) => t -> xs.size.toLong }
    val scores: Map[Long, (Long, Long)] = tf.toSeq
      .map { case ((id, t), f) =>
        val idf = nDocs * 1000000L / dfm(t)
        val sat = (f * 44L * nToks * 1000000L) /
          (20L * nToks * f + 6L * nToks + 18L * dl(id) * nDocs)
        id -> idf * sat / 1000000L
      }
      .groupBy(_._1)
      .map { case (id, xs) => id -> (xs.size.toLong, xs.map(_._2).sum) }
    val expected = scores.toSeq
      .map { case (id, (nt, sc)) => (id, nt, sc) }
      .sortBy { case (id, _, sc) => (-sc, id) }
      .take(15)
    assert(ours == expected)
  }

  // --- MST (Borůvka) vs in-memory Kruskal -------------------------------

  test("Borůvka MSF equals a from-scratch Kruskal union-find, edge for edge") {
    // deterministic 60-vertex multigraph with REPEATED weights (the
    // (w, u, v) tie-break is exactly what makes Borůvka ≡ Kruskal, so
    // ties are the interesting case), plus an isolated 3-cycle island so
    // the FOREST case is exercised
    val raw = (0L until 60L).flatMap { i =>
      Seq((i, (i * 7 + 3) % 60, (i * 31) % 11 + 1),
          (i, (i * 13 + 5) % 60, (i * 17) % 11 + 1))
    } ++ Seq((100L, 101L, 2L), (101L, 102L, 2L), (100L, 102L, 2L))
    val pairs = raw
      .map { case (a, b, w) => (math.min(a, b), math.max(a, b), w) }
      .filter { case (a, b, _) => a != b }.distinct
    val ours = Algos.mst(pairs.toDF("u", "v", "w"))
      .select(col("u"), col("v"), col("w"))
      .as[(Long, Long, Long)].collect().toSeq.sorted

    // Kruskal with path-compressing union-find over (w, u, v) order —
    // shares nothing with the engine's gather-contract rounds
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = pairs.sortBy { case (u, v, w) => (w, u, v) }
      .flatMap { case (u, v, w) =>
        val (ru, rv) = (find(u), find(v))
        if (ru == rv) None else { parent(ru) = rv; Some((u, v, w)) }
      }
    assert(ours == kruskal.sorted)
    assert(ours.size == 60 - 1 + 2) // spanning tree + 3-cycle island tree
  }
}
