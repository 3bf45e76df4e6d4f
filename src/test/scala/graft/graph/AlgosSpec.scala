package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden fixtures replicated from the reference's own tests
  * (FIXTURES.md §A). */
class AlgosSpec extends SparkSpec {
  import spark.implicits._

  /** SSSP fixture of SimpleShortestPathsComputationTest.java:139-201:
    * source 1, expected distances 1→0, 2→1, 3→2, 4→4 (integral weights). */
  test("sssp matches the reference golden fixture") {
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 3L), (2L, 3L, 1L), (2L, 4L, 10L), (3L, 4L, 2L))
      .toDF("src", "dst", "w")
    val got = Algos.sssp(edges, source = 1L).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 4L)))
  }

  /** CC fixture of FIXTURES.md §A3: components {1,2,3} and {4,5}. */
  test("wcc labels components with their min id") {
    val e = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val got = Algos.wcc(Prep.makeSymmetric(e)).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L)))
  }

  test("wcc converges on a long path graph (pointer jumping)") {
    val n = 300
    val e = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("src", "dst")
    val got = Algos.wcc(Prep.makeSymmetric(e))
    assert(got.filter(col("component") =!= 0L).count() == 0)
    assert(got.count() == n)
  }

  test("converged pagerank halts early and matches the fixed-iteration ranks") {
    val e = Prep.makeSymmetric(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst"))
    val (res, rounds) = Algos.pagerankConverged(e, maxIters = 60, tol = 1e-10)
    assert(rounds < 60)                 // tol reached before the cap
    val fixed = Algos.pagerank(e, iterations = 60)
      .select(col("id"), col("pr")).as[(Long, Double)].collect().toMap
    val got = res.as[(Long, Double)].collect().toMap
    assert(got.keySet == fixed.keySet)
    got.foreach { case (id, pr) => assert(math.abs(pr - fixed(id)) < 1e-8) }
    // max-relative metric converges too (same fixpoint, different rule)
    val (_, r2) = Algos.pagerankConverged(e, maxIters = 60, tol = 1e-6,
      convergence = "max_rel")
    assert(r2 < 60)
  }

  test("converged pagerank pays one materializing action per round " +
    "(delta rides the checkpoint job)") {
    val e = Prep.makeSymmetric(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)).toDF("src", "dst"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val fused = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (js.stageInfos.exists(_.name.contains("localCheckpointHashDeltaWhere")))
          fused.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def jobsFor(iters: Int): (Int, Int) = {
      org.apache.spark.sql.graft.CheckpointBridge.drainListeners(spark)
      jobs.set(0); fused.set(0)
      val (_, r) = Algos.pagerankConverged(e, maxIters = iters, tol = 0.0)
      assert(r == iters) // tol 0 can't be undershot: every round runs
      org.apache.spark.sql.graft.CheckpointBridge.drainListeners(spark)
      (jobs.get(), fused.get())
    }
    try {
      val (j3, f3) = jobsFor(3)
      val (j6, f6) = jobsFor(6)
      // The fusion's claim: ONE materializing ACTION per round — the
      // fused checkpoint+delta count (job-traced: its stage carries the
      // localCheckpointHashDeltaWhere call site). Holding that requires
      // the fused helpers to plan the round body NON-adaptively
      // (CheckpointBridge.withAqeOff): under AQE every query-stage
      // materialization is its own job and the same body paid
      // 7 jobs/round (round-8 verdict measurement).
      assert(f6 - f3 == 3,
        s"materializing actions per round changed: maxIters=3 ran $f3, maxIters=6 ran $f6")
      // The remaining per-round jobs are plan-internal BROADCAST builds
      // (async futures, not driver barriers): the dangling-mass scalar —
      // which feeds the RESULT ranks, so it must stay an exact in-plan
      // aggregate; an at-least-once accumulator would corrupt output
      // under retries (ADVICE r7) — plus, at this 5-vertex scale where
      // declared stats make EVERY join broadcastable, the verts⋈edges,
      // sums-join and prev-join build sides. On a real graph those three
      // stay co-partitioned exchange-free joins (declared partitioning),
      // leaving count + dangling broadcast. Bound the toy-scale total so
      // a regression that sneaks extra ACTIONS (the pre-fusion shape
      // paid 7+/round) still fails.
      assert(j6 - j3 <= 3 * 5,
        s"per-round jobs grew past 1 action + 4 broadcasts: maxIters=3 ran $j3, maxIters=6 ran $j6")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bfs levels are hop counts") {
    val e = Prep.makeSymmetric(Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"))
    val got = Algos.bfs(e, Seq(1L)).orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("pagerank mass sums to 1 and ranks the hub highest") {
    // star: 1..5 all point to 0 and back (symmetric)
    val e = Prep.makeSymmetric((1 to 5).map(i => (i.toLong, 0L)).toDF("src", "dst"))
    val pr = Algos.pagerank(e, iterations = 10)
    val total = pr.agg(sum("pr")).first().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
    val top = pr.orderBy(col("pr").desc).first().getLong(0)
    assert(top == 0L)
  }

  test("pagerank redistributes dangling mass (sum stays 1)") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst") // 3 is dangling
    val pr = Algos.pagerank(e, iterations = 8)
    val total = pr.agg(sum("pr")).first().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("degrees counts in/out with 0-fill") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Algos.degrees(e).orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
  }

  /** OR/N-of-M semantics of BrachaTouegDeadlockComputation.java:
    * vertex 1 needs BOTH 2 and 3 (tag 0 — one N-of-M request) OR just 4
    * (tag 1); 4 waits on 1 (cycle). 2 and 3 are sinks, so the tag-0
    * request satisfies and everyone unwinds — no deadlock. */
  test("brachaToueg frees an N-of-M request whose targets all grant") {
    val edges = Seq((1L, 2L, 0L), (1L, 3L, 0L), (1L, 4L, 1L), (4L, 1L, 0L))
      .toDF("src", "dst", "tag")
    val got = Algos.brachaToueg(edges, initiator = 1L).orderBy("id")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq((1L, 1, 1), (2L, 1, 1), (3L, 1, 1), (4L, 1, 1)))
  }

  /** Same shape but 3 is replaced by a 2-cycle member: tag 0 can never
    * fully grant (one target is deadlocked), tag 1 waits on the cycle
    * back to 1 — the initiator is deadlocked. 2 still grants (it is a
    * notified sink). */
  test("brachaToueg detects deadlock when every request hits a cycle") {
    val edges = Seq((1L, 2L, 0L), (1L, 5L, 0L), (1L, 4L, 1L), (4L, 1L, 0L),
      (5L, 6L, 0L), (6L, 5L, 0L))
      .toDF("src", "dst", "tag")
    val got = Algos.brachaToueg(edges, initiator = 1L).orderBy("id")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq((1L, 1, 0), (2L, 1, 1), (3L, 1, 1), (4L, 1, 0),
      (5L, 1, 0), (6L, 1, 0)).filter(_._1 != 3L))
  }

  /** Pure-source initiator: vertex 9 has no in-edges (normally peeled
    * out of both waves), but its own out-edges must still fire the
    * NOTIFY wave and its request must be evaluated. 9 waits on a sink
    * (10) under tag 0 → free. */
  test("brachaToueg handles an initiator that is a pure requester") {
    val edges = Seq((9L, 10L, 0L), (10L, 11L, 0L))
      .toDF("src", "dst", "tag")
    val got = Algos.brachaToueg(edges, initiator = 9L).orderBy("id")
      .as[(Long, Int, Int)].collect().toSeq
    // 11 is a notified sink → grants; 10's single tag fully grants; 9 frees
    assert(got == Seq((9L, 1, 1), (10L, 1, 1), (11L, 1, 1)))
  }

  /** Budget-limited partial fixpoint on the chain 1→2→3→4 (single-target
    * requests, 4 the only sink). With rounds=2 the NOTIFY wave reaches
    * only {1,2,3}, so 4 is never notified, f_0 is empty and NOBODY frees
    * — including the peeled requester 1, judged against the empty
    * f_{rounds-1}. With rounds=4 the full cascade completes: f_0={4},
    * then 3, then 2 in-loop, and 1 via the peeled one-shot evaluation
    * against f_{rounds-1} ⊇ {2,3,4}. */
  test("brachaToueg honors the round budget for notify, grants, and peeled eval") {
    val chain = Seq((1L, 2L, 0L), (2L, 3L, 0L), (3L, 4L, 0L))
      .toDF("src", "dst", "tag")
    val part = Algos.brachaToueg(chain, initiator = 1L, rounds = 2).orderBy("id")
      .as[(Long, Int, Int)].collect().toSeq
    assert(part == Seq((1L, 1, 0), (2L, 1, 0), (3L, 1, 0), (4L, 0, 0)))
    val full = Algos.brachaToueg(chain, initiator = 1L, rounds = 4).orderBy("id")
      .as[(Long, Int, Int)].collect().toSeq
    assert(full == Seq((1L, 1, 1), (2L, 1, 1), (3L, 1, 1), (4L, 1, 1)))
  }

  test("triangleCount on K4 finds 4 triangles") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    assert(Algos.triangleCount(pairs).first().getLong(0) == 4L)
  }

  test("kTruss peels to the K4 core with cascade") {
    // K4 on {1,2,3,4} (every edge in 2 triangles) + triangle {4,5,6}
    // (edges in 1 triangle — fall at k=4) + pendant (6,7) (support 0);
    // the pendant and the side triangle peel, K4 survives exactly
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L)).toDF("u", "v")
    val got = Algos.kTruss(pairs, k = 4).as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
    // k=3 keeps every triangle edge (support ≥ 1) and drops the pendant
    val t3 = Algos.kTruss(pairs, k = 3).as[(Long, Long, Long)].collect().toSeq
    assert(t3.map(p => (p._1, p._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (4L, 5L), (4L, 6L), (5L, 6L)))
  }

  test("independentSet picks a maximal independent set by id priority") {
    // path 1-2-3-4-5: id-priority MIS = {1,3,5}
    val e = Prep.makeSymmetric(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst"))
    val got = Algos.independentSet(e).filter(col("in_set") === 1)
      .orderBy("id").as[(Long, Int)].collect().map(_._1).toSeq
    assert(got == Seq(1L, 3L, 5L))
  }

  test("scc separates a cycle from a tail") {
    // cycle 1→2→3→1 plus tail 3→4 (4 alone)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = Algos.scc(e).orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 4L)))
  }

  test("kCore peels low-degree vertices with cascade") {
    // triangle 1-2-3 (all deg 2) + pendant 3-4: 2-core = the triangle
    val e = Prep.makeSymmetric(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst"))
    val got = Algos.kCore(e, k = 2).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // k=3 kills everything (cascade to empty)
    assert(Algos.kCore(e, k = 3).isEmpty)
  }

  test("clustering coefficient is 1 on K4 and 0 on a path") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val got = Algos.clusteringCoefficient(k4).orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.forall { case (_, tri, cc) => tri == 3L && cc == 1000000L })
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val p = Algos.clusteringCoefficient(path).orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(p.forall(_._3 == 0L))
  }

  test("deadlock marks cycle-reaching vertices only") {
    // cycle 1→2→3→1; 4 waits on 1 (deadlocked); 3→5 sink; chain 6→7 free
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (3L, 5L), (6L, 7L))
      .toDF("src", "dst")
    val got = Algos.deadlock(e).orderBy("id").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1), (5L, 0), (6L, 0), (7L, 0)))
  }

  test("maxProp propagates the component max") {
    val e = Prep.makeSymmetric(Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("src", "dst"))
    val got = Algos.maxProp(e).orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (7L, 9L), (9L, 9L)))
  }

  test("eccentricities: tagged multi-source BFS on a path graph") {
    // path 1-2-3-4-5 (symmetric): ecc(1)=4, ecc(2)=3; all 5 reached
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val sym = (p ++ p.map(x => (x._2, x._1))).toDF("src", "dst")
    val got = Algos.eccentricities(sym, Seq(1L, 2L))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // dist_sum(1) = 0+1+2+3+4 = 10; dist_sum(2) = 1+0+1+2+3 = 7
    assert(got == Seq((1L, 4L, 5L, 10L), (2L, 3L, 5L, 7L)))
  }

  test("eccentricities stay within the reachable component") {
    // two components: {1,2} and {10,11,12} path; source 1 and 10
    val p = Seq((1L, 2L), (10L, 11L), (11L, 12L))
    val sym = (p ++ p.map(x => (x._2, x._1))).toDF("src", "dst")
    val got = Algos.eccentricities(sym, Seq(1L, 10L))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 2L, 1L), (10L, 2L, 3L, 3L)))
  }

  test("two-frontier APIs symmetrize internally: directed input yields " +
    "correct undirected distances, not silently wrong ones") {
    // DIRECTED path 1→2→3→4→5. Before the round-11 guard the
    // two-frontier anti-join was only sound on symmetric input and a
    // programmatic caller handing this frame got wrong answers; now the
    // APIs symmetrize internally, so distances are undirected.
    val directed = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val ecc = Algos.eccentricities(directed, Seq(3L))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // from the middle: ecc 2, all 5 reached, dist_sum 2+1+0+1+2 = 6
    assert(ecc == Seq((3L, 2L, 5L, 6L)))
    val harm = Algos.harmonicCentrality(directed, Seq(5L))
      .as[(Long, Double, Long, Long)].collect().toSeq
    // 5 reaches everything undirected: Σ 1/d over d = 1,2,3,4
    assert(harm.head._1 == 5L && harm.head._3 ==
      Algos.HarmonicLcm + Algos.HarmonicLcm / 2 +
        Algos.HarmonicLcm / 3 + Algos.HarmonicLcm / 4)
    val nf = Algos.neighborhoodFunction(directed, maxH = 4, sampleMod = 1L)
      .as[(Long, Long)].collect().toMap
    // undirected path: N(4) = all 25 pairs reachable
    assert(nf(0L) == 5L && nf(4L) == 25L)
    // betweenness rides the same two-frontier forward pass — same
    // guard (round-11 code review): undirected Brandes from source 1
    // on the path gives δ(2)=3, δ(3)=2, δ(4)=1 (each interior vertex
    // sits on the shortest paths to everything beyond it)
    val bc = Algos.betweenness(directed, Seq(1L))
      .as[(Long, Double)].collect().toMap
    assert(bc == Map(2L -> 3.0, 3L -> 2.0, 4L -> 1.0))
  }

  test("doubleSweep finds the exact diameter of a path graph") {
    // path 1-2-3-4-5: sweep 1 from min id 1 reaches 5 at level 4;
    // sweep 2 from 5 has eccentricity 4 — the true diameter
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val sym = (p ++ p.map(x => (x._2, x._1))).toDF("src", "dst")
    val r = Algos.doubleSweep(sym).as[(Long, Long, Long)].head()
    assert(r === ((1L, 5L, 4L)))
  }

  test("doubleSweep tie-breaks the farthest vertex by min id") {
    // star with two leaves at distance 2 (ids 7 and 9): pick 7
    val p = Seq((1L, 2L), (2L, 7L), (2L, 9L))
    val sym = (p ++ p.map(x => (x._2, x._1))).toDF("src", "dst")
    val r = Algos.doubleSweep(sym).as[(Long, Long, Long)].head()
    assert(r === ((1L, 7L, 2L)))
  }

  /** Kruskal with the same (w, u, v) total order — union-find, an
    * implementation independent of the Borůvka DataFrame loop. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.distinct.sortBy { case (u, v, w) => (w, u, v) }.flatMap { case (u, v, w) =>
      val (ru, rv) = (find(u), find(v))
      if (ru == rv) None else { parent(ru) = rv; Some((u, v, w)) }
    }
  }

  test("mst equals Kruskal under the same edge order (fixture)") {
    // square 1-2-3-4 with a heavy diagonal and a pendant
    val e = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (1L, 4L, 5L),
      (1L, 3L, 9L), (4L, 5L, 2L))
    val got = Algos.mst(e.toDF("u", "v", "w"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == kruskal(e).sorted)
    assert(got.map(_._3).sum == 6L) // 1+2+1+2
  }

  test("mst equals Kruskal on random graphs (incl. disconnected forest)") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val n = 25
      val e = (0 until 80).map { _ =>
        val u = rnd.nextInt(n).toLong
        val v = rnd.nextInt(n).toLong
        (math.min(u, v), math.max(u, v), (1 + rnd.nextInt(9)).toLong)
      }.filter(x => x._1 != x._2).distinct
        // drop parallel edges with different weights: keep min per pair
        .groupBy(x => (x._1, x._2)).map { case ((u, v), xs) => (u, v, xs.map(_._3).min) }
        .toSeq
      val got = Algos.mst(e.toDF("u", "v", "w"))
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(got == kruskal(e).sorted, s"trial=$trial")
    }
  }

  /** Independent md5 walk reference using java MessageDigest directly. */
  private def walkRef(edges: Seq[(Long, Long)], len: Int): Seq[(Long, Int, Long)] = {
    val adj = edges.distinct.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._2).distinct.sorted
    }
    def u6(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 6), 16)
    }
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    verts.flatMap { v =>
      var cur = v
      (v, 0, v) +: (1 to len).map { i =>
        val ns = adj(cur)
        cur = ns((u6(s"$v:$i:$cur") % ns.size).toInt)
        (v, i, cur)
      }
    }
  }

  test("randomWalks matches the independent md5 reference") {
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val sym = (p ++ p.map(x => (x._2, x._1))).distinct
    val got = Algos.randomWalks(sym.toDF("src", "dst"), len = 3)
      .as[(Long, Int, Long)].collect().toSeq.sortBy(x => (x._1, x._2))
    assert(got == walkRef(sym, 3))
  }

  test("edgeJaccard: hand-computed on K4 minus one edge") {
    // K4 on {1,2,3,4} without edge (3,4): N(1)={2,3,4} N(2)={1,3,4}
    // N(3)={1,2} N(4)={1,2}
    // edge (1,2): common {3,4} → 2/(3+3-2-2)=2/2 → 1e6
    // edge (1,3): common {2} → 1/(3+2-2-1)=1/2 → 5e5 (same for 1-4, 2-3, 2-4)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("u", "v")
    val got = Algos.edgeJaccard(pairs, topK = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1000000L),
      (1L, 3L, 1L, 500000L), (1L, 4L, 1L, 500000L),
      (2L, 3L, 1L, 500000L), (2L, 4L, 1L, 500000L)))
  }

  /** Plain-collections LPA with the identical rule (neighborhood mode,
    * min-label ties, keep-old with no in-edges) — an implementation
    * independent of the DataFrame plan. */
  private def lpaRef(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var lbl = verts.map(v => v -> v).toMap
    for (_ <- 0 until rounds) {
      val inbox = edges.groupBy(_._2).map { case (v, es) =>
        val counts = es.map(e => lbl(e._1)).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        v -> counts.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
      lbl = lbl.map { case (v, old) => v -> inbox.getOrElse(v, old) }
    }
    lbl
  }

  test("lpa matches an independent reference on two bridged triangles") {
    // triangles {1,2,3} and {10,11,12} bridged by 3–10: LPA should keep
    // each triangle on its own min label for small round counts
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val sym = pairs ++ pairs.map(p => (p._2, p._1))
    for (rounds <- Seq(1, 2, 4)) {
      val got = Algos.lpa(sym.toDF("src", "dst"), rounds)
        .orderBy("id").as[(Long, Long)].collect().toMap
      assert(got == lpaRef(sym, rounds), s"rounds=$rounds")
    }
  }

  test("lpa matches the reference on a random graph across rounds") {
    // deterministic pseudo-random graph (fixed seed)
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 120).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)).filter(p => p._1 != p._2).distinct
    val sym = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val got = Algos.lpa(sym.toDF("src", "dst"), rounds = 3)
      .orderBy("id").as[(Long, Long)].collect().toMap
    assert(got == lpaRef(sym, 3))
  }

  test("harmonicCentrality: hand-computed on the path graph") {
    // path 1-2-3-4-5: harm(1) = 1 + 1/2 + 1/3 + 1/4; harm(3) = 2(1 + 1/2)
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val sym = (p ++ p.map(x => (x._2, x._1))).toDF("src", "dst")
    val got = Algos.harmonicCentrality(sym, Seq(1L, 3L))
      .as[(Long, Double, Long, Long)].collect()
      .map { case (s, h, num, n) => s -> ((h, num, n)) }.toMap
    assert(math.abs(got(1L)._1 - (1.0 + 0.5 + 1.0 / 3 + 0.25)) < 1e-12)
    assert(math.abs(got(3L)._1 - 3.0) < 1e-12)
    // exact numerators over lcm 720720: 1 + 1/2 + 1/3 + 1/4 = 25/12
    assert(got(1L)._2 == 720720L * 25 / 12)
    assert(got(3L)._2 == 720720L * 3)
    assert(got(1L)._3 == 5L && got(3L)._3 == 5L)
  }

  test("hits: hand-computed on a two-authority star") {
    // 1→10, 2→10, 3→11: after 2 L1 rounds a = (0.8, 0.2) on {10, 11},
    // h = (4/9, 4/9, 1/9) on {1, 2, 3}; the other side of each score is 0
    val e = Seq((1L, 10L), (2L, 10L), (3L, 11L)).toDF("src", "dst")
    val got = Algos.hits(e, iterations = 2)
      .as[(Long, Double, Double)].collect()
      .map { case (id, a, h) => id -> (a, h) }.toMap
    assert(math.abs(got(10L)._1 - 0.8) < 1e-12 && got(10L)._2 == 0.0)
    assert(math.abs(got(11L)._1 - 0.2) < 1e-12 && got(11L)._2 == 0.0)
    assert(math.abs(got(1L)._2 - 4.0 / 9) < 1e-12 && got(1L)._1 == 0.0)
    assert(math.abs(got(2L)._2 - 4.0 / 9) < 1e-12)
    assert(math.abs(got(3L)._2 - 1.0 / 9) < 1e-12)
  }

  test("betweenness: hand-computed Brandes on the path graph") {
    // path 1-2-3-4-5, sources {1, 3}:
    //   δ₁(2)=3, δ₁(3)=2, δ₁(4)=1; δ₃(2)=1, δ₃(4)=1
    //   → bc(2)=4, bc(3)=2, bc(4)=2 (endpoints accumulate nothing)
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val sym = (p ++ p.map(x => (x._2, x._1))).toDF("src", "dst")
    val got = Algos.betweenness(sym, Seq(1L, 3L))
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((2L, 4.0), (3L, 2.0), (4L, 2.0)))
  }

  test("betweenness: star center carries all dependencies") {
    // star 1-{2,3,4,5}, source 2: δ₂(1) = 3 (paths to 3, 4, 5)
    val p = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val sym = (p ++ p.map(x => (x._2, x._1))).toDF("src", "dst")
    val got = Algos.betweenness(sym, Seq(2L))
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3.0)))
  }

  test("temporalReach: stale edges cannot forward newer arrivals") {
    // 1→2 at t=5, 2→3 at t=3, 2→4 at t=7: statically 3 is reachable,
    // temporally it is NOT (arrival at 2 is day 5, the 2→3 edge is day 3)
    val e = Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 4L, 7L)).toDF("src", "dst", "t")
    val got = Algos.temporalReach(e, source = 1L, rounds = 4)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 5L), (4L, 7L)))
  }

  test("temporalReach: a later parallel edge re-opens the path") {
    // adding 1→2 at t=2 makes 2→3 (t=3) traversable: arr(3) = 3
    val e = Seq((1L, 2L, 5L), (1L, 2L, 2L), (2L, 3L, 3L)).toDF("src", "dst", "t")
    val got = Algos.temporalReach(e, source = 1L, rounds = 4)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 2L), (3L, 3L)))
  }

  test("modularity: two disjoint triangles under the exact partition") {
    // per community: i2 = 6, d = 6, m2 = 12 → contrib = 1/2 − 1/4 = 1/4
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val sym = (pairs ++ pairs.map(x => (x._2, x._1))).toDF("src", "dst")
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "community")
    val got = Algos.modularity(sym, comm)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 6L, 6L, 0.25), (4L, 3L, 6L, 6L, 0.25)))
  }

  test("linkPredict: square graph scores both diagonals, skips edges") {
    // cycle 1-2-3-4: non-edges (1,3) and (2,4), each with 2 common
    // neighbors; every vertex has degree 2 so pa = 4
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val got = Algos.linkPredict(pairs, maxMidDeg = 10L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 2L, 4L), (2L, 4L, 2L, 4L)))
  }

  test("linkPredict: hub cap excludes wedges through high-degree centers") {
    // star 0-{1..4}: all leaf pairs share only the center; capping the
    // center's degree (4) away leaves no candidates, while pa would
    // still use the TRUE degree if any survived
    val pairs = (1L to 4L).map(l => (0L, l)).toDF("u", "v")
    assert(Algos.linkPredict(pairs, maxMidDeg = 3L).count() == 0L)
    val full = Algos.linkPredict(pairs, maxMidDeg = 4L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(full == (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b, 1L, 1L)).toSet)
  }

  test("bowtie: all four classes on a hand-built graph") {
    // core {10, 11} (2-cycle), in: 1→10, out: 11→20, other: 30→31
    val e = Seq((10L, 11L), (11L, 10L), (1L, 10L), (11L, 20L), (30L, 31L))
      .toDF("src", "dst")
    val got = Algos.bowtie(e).as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "core", 11L -> "core", 1L -> "in",
      20L -> "out", 30L -> "other", 31L -> "other"))
  }

  test("katz: hand-unrolled integer recurrence on the 3-chain") {
    // 1→2→3, A=2, S=8: round1 x=(8,12,12); round2 x(3)=8+12/2=14
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Algos.katz(e, rounds = 2, attenDiv = 2L, scale = 8L)
      .orderBy(col("id")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 8L), (2L, 12L), (3L, 14L)))
  }

  test("katz: floored division is applied per round, not at the end") {
    // 1→3, 2→3 with A=4, S=10: x1(3) = 10 + (10+10) div 4 = 15;
    // x2(3) identical (sources never change) — and 15 ≠ 10 + 20/4.0
    // rounded any other way
    val e = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Algos.katz(e, rounds = 2, attenDiv = 4L, scale = 10L)
      .orderBy(col("id")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (2L, 10L), (3L, 15L)))
  }

  test("neighborhoodFunction counts exact ball sizes on a path") {
    // path 1-2-3-4 (symmetric), all vertices sampled:
    // N(0)=4; N(1)=2+3+3+2=10; N(2)=3+4+4+3=14; N(3)=16 (saturated)
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = (p ++ p.map(_.swap)).toDF("src", "dst")
    val got = Algos.neighborhoodFunction(e, maxH = 4, sampleMod = 1L)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 4L), (1L, 10L), (2L, 14L), (3L, 16L), (4L, 16L)))
  }

  test("neighborhoodFunction size gate fails fast naming anfSketch past " +
    "the pair-volume boundary") {
    // Round-12 verdict task 1: the exact operator's pair-shaped state
    // must fail ACTIONABLY (not by executor disk exhaustion, as the
    // 100× probe did) when the projected wave volume crosses the knob.
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = (p ++ p.map(_.swap)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      Algos.neighborhoodFunction(e, maxH = 4, sampleMod = 1L, maxPairs = 5L)
    }
    assert(ex.getMessage.contains("anfSketch"), ex.getMessage)
    assert(ex.getMessage.contains("maxPairs=5"), ex.getMessage)
    // the gate frees its checkpoints on the failure path: no pinned
    // blocks beyond what the session already held
    // (covered structurally — the throw path frees frontier/prev/e)
    // and a generous knob leaves the result bit-identical
    val got = Algos.neighborhoodFunction(e, maxH = 4, sampleMod = 1L)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 4L), (1L, 10L), (2L, 14L), (3L, 16L), (4L, 16L)))
  }

  test("greedyColoring produces a proper coloring with mex color choice") {
    // triangle 1-2-3 plus pendant 4: needs 3 colors on the triangle,
    // pendant takes the mex against its single neighbor
    val p = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val e = (p ++ p.map(_.swap)).toDF("src", "dst")
    val got = Algos.greedyColoring(e).as[(Long, Long)].collect().toMap
    assert(got.size == 4 && got.values.forall(_ >= 0L))
    p.foreach { case (u, v) => assert(got(u) != got(v), s"edge ($u,$v) same color") }
    assert(got.values.toSet.contains(0L)) // greedy always uses color 0
    assert(Set(got(1L), got(2L), got(3L)) == Set(0L, 1L, 2L)) // triangle = 3 colors
    // deterministic: second run identical (md5 priorities, no RNG)
    assert(Algos.greedyColoring(e).as[(Long, Long)].collect().toMap == got)
  }

  test("greedyColoring colors an independent pair in one concurrent round") {
    val p = Seq((1L, 2L), (3L, 4L))
    val e = (p ++ p.map(_.swap)).toDF("src", "dst")
    val got = Algos.greedyColoring(e).as[(Long, Long)].collect().toMap
    assert(got(1L) != got(2L) && got(3L) != got(4L))
    assert(got.values.max <= 1L) // 2-colorable stays 2-colored
  }

  test("maximalMatching is a matching and is maximal") {
    // path 1-2-3-4-5 plus isolated edge 6-7
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
    val e = (p ++ p.map(_.swap)).toDF("src", "dst")
    val m = Algos.maximalMatching(e).as[(Long, Long)].collect().toSeq
    val mv = m.flatMap(t => Seq(t._1, t._2))
    assert(mv.distinct.size == mv.size, "a vertex is matched twice")
    m.foreach { case (u, v) => assert(p.contains((u, v)) || p.contains((v, u))) }
    // maximality: no live edge with both endpoints unmatched
    val um = Set(1L, 2L, 3L, 4L, 5L, 6L, 7L) -- mv.toSet
    p.foreach { case (u, v) =>
      assert(!(um.contains(u) && um.contains(v)), s"edge ($u,$v) left unmatched")
    }
    assert(m.map(t => Set(t._1, t._2)).contains(Set(6L, 7L))) // isolated edge always matches
    // deterministic
    assert(Algos.maximalMatching(e).as[(Long, Long)].collect().toSeq == m)
  }

  test("anfSketch tracks the exact neighborhood function on a clique") {
    // 50-clique: N(1) = N(2) = 2500 (every ball saturates in one hop).
    // The FM sketch (64 registers, deterministic md5 seeds) must land
    // within 15% of exact at h ≥ 1 — its operating range is LARGE balls
    // (the raw Flajolet–Martin estimator is biased high below ~10
    // elements; that regime belongs to the exact operator, which is why
    // the assertion starts at the saturated rounds).
    val n = 50L
    val pairs = for (i <- 0L until n; j <- 0L until n if i != j) yield (i, j)
    val e = pairs.toDF("src", "dst")
    val exact = Algos.neighborhoodFunction(e, maxH = 2, sampleMod = 1L)
      .as[(Long, Long)].collect().toMap
    assert(exact == Map(0L -> 50L, 1L -> 2500L, 2L -> 2500L))
    val est = Algos.anfSketch(e, maxH = 2, numReg = 64)
      .as[(Long, Double)].collect().toMap
    (1L to 2L).foreach { h =>
      val rel = math.abs(est(h) - exact(h)) / exact(h)
      assert(rel < 0.15, s"h=$h est=${est(h)} exact=${exact(h)} rel=$rel")
    }
  }
}
