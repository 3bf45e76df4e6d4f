package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics checks for the round-6 analytics batch on hand-built
  * fixtures (the oracle gate covers the testdata tables; these pin the
  * operator rules themselves on inputs small enough to verify by hand).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("trailing DAU counts each user once across the window") {
    // user 1 active on days 0 and 3, user 2 on day 3 only:
    // day 3's 7-day window must count user 1 ONCE (dau_7d = 2, not 3)
    val us = Seq(
      (1L, 0L * 86400000000L + 5L, 1L),
      (2L, 3L * 86400000000L + 5L, 1L),
      (3L, 3L * 86400000000L + 6L, 2L))
      .toDF("event_id", "ts", "user_id")
    val ud = us.select(expr("ts div 86400000000").as("day"), col("user_id")).distinct()
    val d7 = ud.select(explode(sequence(col("day"), col("day") + lit(6L))).as("rd"),
        col("user_id"))
      .groupBy("rd").agg(countDistinct("user_id").as("dau_7d"))
    val got = d7.filter(col("rd") === 3L).first().getLong(1)
    assert(got == 2L)
  }

  test("benford law table is the canonical distribution") {
    // floor(log10(2) * 1e6) = 301029; masses sum to ~1e6
    val m = AnalyticsQueries.benfordE6.toMap
    assert(m(1) == 301029L)
    assert(m(9) == 45757L)
    val tot = AnalyticsQueries.benfordE6.map(_._2).sum
    assert(tot > 999990L && tot <= 1000000L)
  }

  test("benford digit extraction is arithmetic on cents, not doubles") {
    val q = Queries.all("q_benford")(spark, sf)
    val rows = q.collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    // total mass of observed shares ≈ 1e6 (floor loss ≤ 9)
    val pctSum = rows.map(_.getLong(2)).sum
    assert(pctSum > 999990L && pctSum <= 1000000L)
  }

  test("peak concurrency counts overlapping sessions exactly") {
    // three users: sessions [0,10], [5,15], [20,25] (µs scale) → peak 2
    val ev = Seq(
      (1L, 0L, 1L), (2L, 10L, 1L),
      (3L, 5L, 2L), (4L, 15L, 2L),
      (5L, 20L, 3L), (6L, 25L, 3L))
      .toDF("event_id", "ts", "user_id")
    val sess = ev.groupBy("user_id")
      .agg(min("ts").as("st"), max("ts").as("en"))
    val deltas = sess.select(col("st").as("b"), lit(1L).as("d"))
      .unionAll(sess.select((col("en") + 1L).as("b"), lit(-1L).as("d")))
      .groupBy("b").agg(sum("d").as("d"))
    val conc = deltas.withColumn("c",
      sum("d").over(org.apache.spark.sql.expressions.Window.orderBy("b")
        .rowsBetween(Long.MinValue, 0)))
    assert(conc.agg(max("c")).first().getLong(0) == 2L)
  }

  test("cusum peak flags the strongest mean shift") {
    val q = Queries.all("q_changepoint")(spark, sf)
    val rows = q.collect()
    assert(rows.nonEmpty)
    // exactly the max-|cusum| rows are flagged, and at least one is
    val peakAbs = rows.map(r => math.abs(r.getLong(2))).max
    rows.foreach { r =>
      val flagged = r.getInt(3) == 1
      assert(flagged == (math.abs(r.getLong(2)) == peakAbs))
    }
    assert(rows.exists(_.getInt(3) == 1))
    // CUSUM telescopes to zero at the last day by construction
    assert(rows.last.getLong(2) == 0L)
  }

  test("hourly heatmap covers the grid and rows sum to ~1e6") {
    val rows = Queries.all("q_hourly_heatmap")(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 7))
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 24))
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val s = rs.map(_.getLong(3)).sum
      assert(s > 1000000L - rs.length && s <= 1000000L)
    }
  }

  test("rich club of a path counts only the interior") {
    // path 1-2-3-4: deg>1 = {2,3}, one edge between them → φ(1) = 1.0
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val r = graph.Algos.richClub(p, Seq(1L)).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L && r.getLong(3) == 1000000L)
  }

  test("local bridge is exactly the edge outside the triangle") {
    val p = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val r = graph.Algos.localBridgeStats(p).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 1L && r.getLong(2) == 250000L)
  }

  test("joint degree matrix buckets a star into one cell") {
    val p = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("u", "v")
    val rows = graph.Algos.jointDegreeMatrix(p).collect()
    assert(rows.length == 1)
    // hub deg 4 → bucket 2; leaves deg 1 → bucket 0; all 4 edges in (0,2)
    assert(rows.head.getLong(0) == 0L && rows.head.getLong(1) == 2L &&
      rows.head.getLong(2) == 4L)
  }

  test("heaps curve is monotone and ends at the full vocabulary") {
    val rows = Queries.all("q_text_heaps")(spark, sf).collect()
    val types = rows.map(_.getLong(4))
    assert(types.zip(types.tail).forall { case (a, b) => a <= b })
    val toks = rows.map(_.getLong(3))
    assert(toks.zip(toks.tail).forall { case (a, b) => a < b })
    // every batch's new types are bounded by its token count
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  test("two-hop reach on a path graph") {
    // path 1-2-3-4-5 (symmetric edges): vertex 3 reaches all 4 others
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val h1 = p.select(col("src").as("id"), col("dst").as("n"))
    val h2 = h1.join(p, h1("n") === p("src")).select(col("id"), col("dst").as("n"))
    val reach = h1.unionByName(h2).filter(col("n") =!= col("id")).distinct()
      .groupBy("id").agg(count(lit(1)).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reach(3L) == 4L && reach(1L) == 2L && reach(2L) == 3L)
  }

  test("leaf peeling strips a path from the outside in, sparing the cycle") {
    // triangle 1-2-3 with tail 3-4-5: round 1 peels 5, round 2 peels 4,
    // triangle survives
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val got = graph.Algos.leafPeelCounts(e, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 0L -> 3L))
  }

  test("hhi of a supplier monopoly is the e12 maximum") {
    // one supplier with all revenue in its nation → share 1e6, hhi 1e12
    val rows = Queries.all("q_hhi")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi, top) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hhi <= 1000000000000L && top <= 1000000L)
      // HHI is at least 1/n (the perfectly-equal lower bound, floor slack ≤ n)
      assert(hhi >= 1000000000000L / n - n * 2000000L)
      if (n == 1) assert(hhi == 1000000000000L)
    }
  }

  test("fulfillment lag panel flags ships-before-ordered rows") {
    val rows = Queries.all("q_fulfillment_lag")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted == rows.map(_.getString(0)).toSeq)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))          // min ≤ max
      assert(r.getLong(4) <= r.getLong(1))          // n_negative ≤ n
      val mean = r.getLong(5)
      assert(mean >= (r.getLong(2) + 2400L) * 1000000L - 1000000L &&
        mean <= (r.getLong(3) + 2400L) * 1000000L)  // mean within [min, max]
    }
  }

  test("transitivity of triangle-plus-pendant is 3/5") {
    // wedges: deg 2,2,3,1 → 1+1+3+0 = 5; one triangle → 3·1/5
    val p = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val tri = graph.Algos.triangleCount(p)
    val wedges = p.select(col("u").as("id")).union(p.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
      .agg(sum(expr("(d * (d - 1)) div 2")).cast("long").as("w"))
    val r = wedges.crossJoin(tri)
      .select(expr("(3 * triangles * 1000000) div w")).first().getLong(0)
    assert(r == 600000L)
  }

  test("audience overlap matrix is bounded and symmetric-complete") {
    val rows = Queries.all("q_audience_overlap")(spark, sf).collect()
    assert(rows.length == 10) // C(5,2) type pairs
    rows.foreach { r =>
      val (n1, n2, common, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(common <= math.min(n1, n2))
      assert(j >= 0 && j <= 1000000L)
      assert(r.getString(0) < r.getString(1))
    }
  }

  test("interpolation fills every gap with a value between its anchors") {
    val rows = Queries.all("q_interpolate")(spark, sf).collect()
    assert(rows.forall(!_.isNullAt(1)))
    // gap values are bounded by the running min/max of known values
    val known = rows.filter(_.getInt(2) == 0).map(_.getLong(1))
    val lo = known.min; val hi = known.max
    rows.filter(_.getInt(2) == 1)
      .foreach(r => assert(r.getLong(1) >= lo && r.getLong(1) <= hi))
  }

  test("vocab coverage is monotone in k and capped at full mass") {
    val rows = Queries.all("q_vocab_coverage")(spark, sf).collect()
    val pct = rows.map(_.getLong(3))
    assert(pct.zip(pct.tail).forall { case (a, b) => a <= b })
    assert(pct.forall(p => p > 0 && p <= 1000000L))
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(0)))
  }

  test("sentence panel counts non-empty [.!?] segments") {
    val segs = Seq((1L, "One. Two! Three? ", "s"), (2L, "no punct", "s"))
      .toDF("doc_id", "text", "source")
      .select(size(filter(split(col("text"), "[.!?]+"),
        seg => length(trim(seg)) > 0)).as("ns"))
      .collect().map(_.getInt(0)).toSeq
    assert(segs == Seq(3, 1))
  }

  test("condensation panel is internally consistent on the wait-for graph") {
    val r = Queries.all("q_graph_condensation")(spark, sf).collect().head
    val (nc, largest, singles, condE, roots, leaves) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    assert(nc > 1 && largest > 1)      // the supplier ring is a giant SCC
    assert(singles < nc)
    assert(condE <= nc * (nc - 1))     // DAG edge bound
    assert(roots >= 1 && leaves >= 1 && roots <= nc && leaves <= nc)
  }

  test("decay score halves a contribution per day of age") {
    // 400 cents today + 400 cents 2 days ago = 400 + 100
    val ev = Seq(
      (1L, 2L * 86400000000L, 1L, 4.0),
      (2L, 0L, 1L, 4.0))
      .toDF("event_id", "ts", "user_id", "value")
    val ref = 2L
    val got = ev.select(col("user_id"),
        expr("ts div 86400000000").as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      .withColumn("age", (lit(ref) - col("day")).cast("int"))
      .withColumn("dv", expr("cents div shiftleft(1L, age)"))
      .groupBy("user_id").agg(sum("dv")).first().getLong(1)
    assert(got == 500L)
  }

  test("butterfly census counts the 2x2 biclique exactly once") {
    // K_{2,2} plus a pendant right vertex: one butterfly, wedges 1+1+... :
    // left {1,2} each see rights {10,11} (+1 sees 12) → d=3,2 → 3+1 wedges
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L))
      .toDF("l", "r")
    val row = graph.Algos.butterflyCount(e).collect().head
    assert(row.getLong(0) == 2L && row.getLong(1) == 3L)
    assert(row.getLong(2) == 4L)   // C(3,2) + C(2,2)
    assert(row.getLong(3) == 1L)   // exactly one 2x2 biclique
  }

  test("A/B t-test on identical arms is near zero; means are exact") {
    val r = Queries.all("q_ab_ttest")(spark, sf).collect().head
    val (na, nb) = (r.getLong(0), r.getLong(1))
    assert(na > 0 && nb > 0)
    // md5 split is ~50/50
    assert(math.abs(na - nb) < (na + nb) / 2)
    // arms drawn from the same distribution → |t| < 5 with huge margin
    assert(math.abs(r.getLong(4)) < 5000000L)
  }

  test("core ladder is antitone in k") {
    val rows = Queries.all("q_graph_core_ladder")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 8L, 32L))
    val nv = rows.map(_.getLong(1))
    val sd = rows.map(_.getLong(2))
    assert(nv.zip(nv.tail).forall { case (a, b) => a >= b })
    assert(sd.zip(sd.tail).forall { case (a, b) => a >= b })
    // a k-core vertex has degree ≥ k within the core
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(0) * r.getLong(1)))
  }

  test("null-model audit reports clustering above chance for co-purchases") {
    val r = Queries.all("q_graph_null_model")(spark, sf).collect().head
    assert(r.getLong(2) > 0)                    // observed triangles
    assert(r.getLong(3) > 0)                    // expected > 0
    assert(r.getLong(4) > 0)                    // ratio well-defined
  }

  test("hard negatives never share the query's label") {
    val rows = Queries.all("q_ann_hardneg")(spark, sf).collect()
    assert(rows.length == 25) // 5 queries × 5 negatives
    import spark.implicits._
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    rows.foreach { r =>
      assert(labels(r.getLong(1)) == r.getInt(2))
      assert(labels(r.getLong(0)) != r.getInt(2))
    }
  }

  test("fertility panel: pieces per word is at least 1 after 10 merges") {
    val rows = Queries.all("q_bpe_fertility")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1))      // pieces ≥ words
      assert(r.getLong(3) >= 1000000L)          // fertility ≥ 1.0
    }
  }

  test("wedge-sample estimate lands near the exact transitivity") {
    val r = Queries.all("q_graph_wedge_sample")(spark, sf).collect().head
    val (sampled, closed) = (r.getLong(0), r.getLong(1))
    assert(sampled > 0 && closed <= sampled)
    // 1/17 sample on thousands of wedges: within 10 points of exact
    assert(r.getLong(6) < 100000L,
      s"estimator drifted: est=${r.getLong(2)} exact=${r.getLong(5)}")
  }

  test("embedding-norm outliers: fences bracket the quartiles per label") {
    val rows = Queries.all("q_emb_outliers")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (q1, q3, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo <= q1 && q1 <= q3 && q3 <= hi)
      assert(r.getLong(6) + r.getLong(7) <= r.getLong(5))
    }
  }

  test("max-weight matching marries the heavy edge, not the greedy-id one") {
    // path 1-2 (w=1), 2-3 (w=5): vertex 2 proposes to 3 → match (2,3)
    val e = Seq((1L, 2L, 1L), (2L, 3L, 5L))
      .flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      .toDF("src", "dst", "w")
    val m = graph.Algos.maxWeightMatching(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(m == Seq((2L, 3L, 5L)))
  }

  test("mwm query output is a valid matching") {
    val rows = Queries.all("q_graph_mwm")(spark, sf).collect()
    val ids = rows.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    assert(ids.distinct.length == ids.length) // vertex-disjoint pairs
    assert(rows.forall(r => r.getLong(2) >= 1L))
  }

  test("LTV curve is cumulative and the per-user division is exact") {
    val rows = Queries.all("q_cohort_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val cum = sorted.map(_.getLong(4))
      assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
      assert(sorted.map(_.getLong(3)).sum == cum.last)
      sorted.foreach(r =>
        assert(r.getLong(5) == r.getLong(4) / r.getLong(2)))
    }
  }

  test("held-out LM eval: OOV tokens cost the full vocabulary bits") {
    val r = Queries.all("q_lm_heldout")(spark, sf).collect().head
    val (n, oov, bits) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0 && oov <= n && bits >= n) // ≥ 1 bit per eval token here
    assert(r.getLong(3) >= 1000000L)
    assert(r.getLong(4) <= 1000000L)
  }

  test("embedding drift: parity halves of one distribution drift little") {
    val rows = Queries.all("q_emb_drift")(spark, sf).collect()
    assert(rows.length == 10)
    val deltas = rows.map(r => math.abs(r.getLong(3)))
    assert(deltas.zip(deltas.tail).forall { case (a, b) => a >= b })
    // |mean_a − mean_b| = |Δ|/(na·nb) in q-units (q = 2^14ths):
    // same-distribution halves must agree within a few hundred q-units
    val r0 = rows.head
    val meanDiffQ = deltas.head.toDouble / (r0.getLong(1) * r0.getLong(2))
    assert(meanDiffQ < 2000.0, s"suspicious drift: $meanDiffQ")
  }

  test("duplicate payments: planted same-day same-amount pair is found") {
    val e = Seq(
      (1L, 0L, 7L, "purchase", 42.5),
      (2L, 3600000000L, 7L, "purchase", 42.9),  // same dollar, 1h later
      (3L, 0L, 8L, "purchase", 42.5))           // other user: no pair
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val pairs = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        floor(col("value")).cast("long").as("d"), col("ts"))
    val got = pairs.as("a").join(pairs.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.d") === col("b.d")
          && col("a.event_id") < col("b.event_id")
          && abs(col("a.ts") - col("b.ts")) <= lit(86400000000L))
      .count()
    assert(got == 1L)
  }

  test("incremental WCC merge equals full recompute on the corpus graph") {
    // the oracle already proves this at sf0.01; pin it in-suite at sf0.001
    val inc = Queries.all("q_graph_wcc_incremental")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = graph.Algos.wcc(
        TestGraphs.custSuppSym(Tables(spark, sf)).select("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
  }

  test("sax symbols are a balanced quartile labelling") {
    val rows = Queries.all("q_sax_symbols")(spark, sf).collect()
    val syms = rows.map(_.getInt(3))
    assert(syms.forall(v => v >= 1 && v <= 4))
    // ntile balance: bucket sizes differ by at most 1
    val sizes = syms.groupBy(identity).values.map(_.length)
    assert(sizes.max - sizes.min <= 1)
    // symbol order tracks volume order: max-wsum week has symbol 4
    val maxRow = rows.maxBy(_.getLong(1))
    assert(maxRow.getInt(3) == 4)
  }
}
