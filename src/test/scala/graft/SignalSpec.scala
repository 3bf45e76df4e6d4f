package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the round-6 sixth-wave batch on hand-built
  * fixtures (the oracle gate covers the testdata tables; these pin the
  * operator rules themselves on inputs small enough to verify by hand).
  */
class SignalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("EWMA fold replays the integer recurrence exactly") {
    val rows = Queries.all("q_ewma_daily")(spark, sf)
      .filter(col("event_type") === "click")
      .orderBy(col("day"))
      .select(col("v"), col("ewma")).as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    var e = -1L
    rows.foreach { case (v, got) =>
      e = if (e < 0) v else (7 * e + v) / 8
      assert(got == e)
    }
  }

  test("CUPED matches an independent BigInt re-derivation") {
    val t = Tables(spark, sf)
    val ev = t.events.select(col("user_id"),
        col("ts"), floor(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)].collect()
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val per = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.filter(_._2 < mid).map(_._3).sum, es.filter(_._2 >= mid).map(_._3).sum)
    }.toSeq
    val n = BigInt(per.size)
    val sx = per.map(r => BigInt(r._2)).sum
    val sy = per.map(r => BigInt(r._3)).sum
    val sxx = per.map(r => BigInt(r._2) * r._2).sum
    val sxy = per.map(r => BigInt(r._2) * r._3).sum
    val covn = n * sxy - sx * sy
    val varn = n * sxx - sx * sx
    val theta = covn.signum * ((covn.abs * 1000000) / varn)
    val got = Queries.all("q_cuped")(spark, sf).orderBy(col("variant"))
      .select(col("variant"), col("n_users"), col("adj_mean_cents"), col("theta_e6"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._4).toSet == Set(theta.toLong))
    got.foreach { case (vr, nu, adj, _) =>
      val vper = per.filter(_._1 % 2 == vr)
      assert(nu == vper.size.toLong)
      val nv = BigInt(vper.size)
      val spre = vper.map(r => BigInt(r._2)).sum
      val spost = vper.map(r => BigInt(r._3)).sum
      val adjNum = n * spost * 1000000 - theta * (n * spre - nv * sx)
      val want = adjNum.signum * (adjNum.abs / (1000000 * nv * n))
      assert(adj == want.toLong)
    }
  }

  test("videoFrameStats reads real frame payload bytes") {
    // two frames: 1×1 pixels (3 bytes 10,20,30) then 2×1 (6 bytes 1..6)
    val payload =
      "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20, 30) ++
        "P6\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val df = Seq((7L, payload)).toDF("doc_id", "payload")
    val got = multimodal.Multimodal.videoFrameStats(df)
      .orderBy(col("frame_idx"))
      .select(col("frame_idx"), col("width"), col("height"), col("sum_px"), col("n_px"))
      .as[(Int, Int, Int, Long, Long)].collect().toSeq
    assert(got == Seq((0, 1, 1, 60L, 3L), (1, 2, 1, 21L, 6L)))
  }

  test("videoFrameStats drops a truncated trailing frame") {
    val payload =
      "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20, 30) ++
        "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2) // claims 12
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    assert(multimodal.Multimodal.videoFrameStats(df).count() == 1L)
  }

  test("SALSA divides by degree before propagating (1 round, by hand)") {
    // 1→3, 2→3, 2→4: od(1)=1, od(2)=2; idg(3)=2, idg(4)=1
    // a: a(3)=1/1+1/2=1.5, a(4)=0.5, Σ=2 → 0.75/0.25
    // h: h(1)=0.75/2, h(2)=0.75/2+0.25/1=0.625, Σ=1 → unchanged
    val e = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val rows = graph.Algos.salsa(e, iterations = 1)
      .select(col("id"), col("auth"), col("hub"))
      .as[(Long, Double, Double)].collect()
    val auth = rows.map(r => r._1 -> r._2).toMap
    val hub = rows.map(r => r._1 -> r._3).toMap
    assert(math.abs(auth(3L) - 0.75) < 1e-12 && math.abs(auth(4L) - 0.25) < 1e-12)
    assert(math.abs(hub(1L) - 0.375) < 1e-12 && math.abs(hub(2L) - 0.625) < 1e-12)
    assert(auth(1L) == 0.0 && hub(3L) == 0.0)
  }

  test("winnowing guarantees a shared fingerprint for an 11-char match") {
    // w + k − 1 = 4 + 8 − 1 = 11: any common substring of length ≥ 11
    // must contribute at least one common selected hash
    val common = "abcdefghijk" // exactly 11 chars
    val d = Seq((1L, s"xxxx${common}yyyyyyy"), (2L, s"zzzzzzzzz${common}qq"))
      .toDF("doc_id", "text")
    val sel = SignalQueries.winnowPanel(d)
    assert(sel.count() == 2)
    // recompute the selected hash SETS via the same panel on a widened
    // output — compare fp overlap through the fp_min of the common-only doc
    val dCommon = Seq((3L, common)).toDF("doc_id", "text")
    val fpCommon = SignalQueries.winnowPanel(dCommon)
      .select(col("fp_min")).as[String].head()
    // doc 3 is exactly the common substring: its single window's min hash
    // must appear among each larger doc's selected hashes
    val hs = d.select(col("doc_id"), expr(
      """array_distinct(transform(
        |sequence(1, greatest(length(text) - 7 - 3, 1)),
        |w -> substring(array_min(slice(transform(sequence(1, length(text) - 7),
        |p -> concat(md5(substring(text, p, 8)),
        |lpad(cast(100000000 - p as string), 9, '0'))), w, 4)), 1, 32)))"""
        .stripMargin.replace('\n', ' ')).as("sel"))
    val sets = hs.select(col("doc_id"), col("sel")).as[(Long, Seq[String])].collect().toMap
    assert(sets(1L).intersect(sets(2L)).nonEmpty)
  }

  test("Holt fold replays the sign-safe double-smoothing recurrence") {
    val rows = Queries.all("q_holt_linear")(spark, sf)
      .filter(col("event_type") === "click")
      .orderBy(col("day"))
      .select(col("v"), col("level"), col("trend")).as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    def tdiv(a: Long, b: Long): Long = a / b // JVM / truncates toward zero
    var l = -1L; var b = 0L
    rows.foreach { case (v, gl, gb) =>
      if (l < 0) { l = v; b = 0L }
      else {
        val l2 = tdiv(v + 3 * (l + b), 4)
        b = tdiv(7 * b + (l2 - l), 8)
        l = l2
      }
      assert(gl == l && gb == b)
    }
    // declines must produce genuinely negative trend somewhere
    assert(rows.map(_._3).min < 0)
  }

  test("power iteration finds the dominant axis of an anisotropic cloud") {
    // vectors spread along (1,1) in a 2-D corpus: the top principal
    // direction must weight both dims equally — |x0| = |x1| = 1024 and
    // same sign (the variance along (1,-1) is zero)
    val vecs = Seq(
      (1L, Array(1.0f, 1.0f)), (2L, Array(2.0f, 2.0f)),
      (3L, Array(-1.0f, -1.0f)), (4L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val got = sim.Similarity.powerIteration(vecs, dim = 2, rounds = 4)
      .select(col("dim"), col("comp")).as[(Long, Long)].collect().toMap
    assert(got(0L) == got(1L) && math.abs(got(0L)) == 1024L)
  }

  test("mix-epochs weights sum to exactly 1e6 with largest-remainder") {
    val rows = Queries.all("q_mix_epochs")(spark, sf)
      .select(col("weight_e6"), col("alloc_chars"), col("chars"))
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).sum == 1000000L)
    // 2x budget: average epochs across sources must straddle 2.0
    val e3 = rows.map(r => (r._2 * 1000) / r._3)
    assert(e3.min < 2000L || e3.max > 2000L)
  }

  test("quantile sketch bucket bound always contains the exact quantile") {
    val rows = Queries.all("q_quantile_sketch")(spark, sf)
      .select(col("q"), col("bucket_ub"), col("exact_cents"), col("ub_over_exact_e3"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(50L, 90L, 99L))
    rows.foreach { case (_, ub, exact, ratio) =>
      assert(ub >= exact)                    // never an underestimate
      assert(ratio >= 1000L && ratio < 2000L) // ≤ 2x by the log2-bucket bound
    }
  }

  test("path trigrams match an independent in-memory re-derivation") {
    val t = Tables(spark, sf)
    val ev = t.events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val counts = scala.collection.mutable.Map.empty[(String, String, String), Long]
    ev.groupBy(_._1).foreach { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      // split into sessions on >30min gaps, then slide a width-3 window
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (acc, e) =>
          acc match {
            case cur :: rest if e._2 - cur.head._2 <= 1800000000L => (e :: cur) :: rest
            case _ => List(e) :: acc
          }
      }.map(_.reverse)
      sessions.foreach { sess =>
        sess.map(_._4).sliding(3).filter(_.size == 3).foreach { w =>
          val k = (w(0), w(1), w(2))
          counts(k) = counts.getOrElse(k, 0L) + 1
        }
      }
    }
    val want = counts.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20).toMap
    val got = Queries.all("q_path_trigrams")(spark, sf)
      .select(col("t1"), col("t2"), col("t3"), col("cnt"))
      .as[(String, String, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(got == want)
  }

  test("wavFrameEnergies decodes real PCM frames (hand-checked doc)") {
    // doc_id 4: mono, 8-bit, 14 samples of |(i % 253) - 128|
    val docs = Seq((4L, "x")).toDF("doc_id", "text")
    val got = multimodal.Multimodal.wavFrameEnergies(
        multimodal.Multimodal.documentsAsWav(docs))
      .orderBy(col("frame_idx"))
      .select(col("frame_idx"), col("f_sum"), col("f_n"))
      .as[(Long, Long, Long)].collect().toSeq
    val samples = (0 until 14).map(i => math.abs((i % 253) - 128).toLong)
    val want = samples.grouped(8).zipWithIndex
      .map { case (g, i) => (i.toLong, g.sum, g.size.toLong) }.toSeq
    assert(got == want)
  }

  test("sampled 2-hop expansion is bounded by the 3x3 fanout") {
    val rows = Queries.all("q_graph_sample_fanout")(spark, sf)
      .select(col("n_2hop"), col("n_paths")).as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (d, p) =>
      assert(p <= 9L)      // 3 sampled neighbors x 3 sampled neighbors
      assert(d <= p && d >= 1L)
    }
  }

  test("negative samples are never true edges and cap at 2 per vertex") {
    val t = Tables(spark, sf)
    val edges = TestGraphs.partCoPairs(t)
      .select(col("u"), col("v")).as[(Long, Long)].collect()
      .flatMap(p => Seq(p, (p._2, p._1))).toSet
    val neg = Queries.all("q_graph_negative_samples")(spark, sf)
      .select(col("src"), col("dst")).as[(Long, Long)].collect()
    assert(neg.nonEmpty)
    neg.foreach { p =>
      assert(!edges.contains(p), s"negative $p is a true edge")
      assert(p._1 != p._2)
    }
    neg.groupBy(_._1).foreach { case (_, ps) => assert(ps.length <= 2) }
  }

  test("session survival curve is monotone non-increasing") {
    val rows = Queries.all("q_session_survival")(spark, sf)
      .orderBy(col("h_min"))
      .select(col("h_min"), col("n_alive"), col("total"), col("share_e6"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._2 <= a._2)
      case _ =>
    }
    rows.foreach { r => assert(r._4 <= 1000000L && r._2 <= r._3) }
  }

  test("batched multi-source RWR with one source equals the single-source run") {
    val tb = Tables(spark, sf)
    val e = TestGraphs.custSuppSym(tb)
    val multi = graph.Algos.rwrMulti(e, nSources = 1, iterations = 3)
      .select(col("id"), col("pr")).as[(Long, Double)].collect().toMap
    val srcId = e.select(col("src")).as[Long].collect().min
    val single = graph.Algos.randomWalkWithRestart(e, srcId, iterations = 3)
      .select(col("id"), col("pr")).as[(Long, Double)].collect().toMap
    assert(multi.keySet == single.keySet)
    multi.foreach { case (id, pr) =>
      assert(math.abs(pr - single(id)) < 1e-12, s"pr mismatch at $id")
    }
  }

  test("K4 census: one clique in K4, five in K5") {
    def census(pairs: Seq[(Long, Long)]): (Long, Long) = {
      val df = pairs.toDF("u", "v")
      // route through the query body by swapping the testdata graph for
      // the fixture: re-derive with the same join chain
      val cp = df.localCheckpoint()
      val t = cp.as("a")
        .join(cp.as("b"), col("b.u") === col("a.u") && col("b.v") > col("a.v"))
        .join(cp.as("c"), col("c.u") === col("a.v") && col("c.v") === col("b.v"))
        .select(col("a.u").as("x"), col("a.v").as("y"), col("b.v").as("z"))
      val ext = t
        .join(cp.select(col("u").as("z"), col("v").as("d")), Seq("z"))
        .join(cp.select(col("u").as("x"), col("v").as("d")), Seq("x", "d"), "left_semi")
        .join(cp.select(col("u").as("y"), col("v").as("d")), Seq("y", "d"), "left_semi")
      (t.count(), ext.count())
    }
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    assert(census(k4) == ((4L, 1L)))
    val k5 = for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j)
    assert(census(k5) == ((10L, 5L)))
  }

  test("markov removal effects: removing a channel never raises conversion") {
    val rows = Queries.all("q_markov_attribution")(spark, sf)
      .select(col("channel"), col("p_full_e6"), col("p_removed_e6"), col("removal_effect_e6"))
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ch, full, removed, eff) =>
      assert(removed <= full, s"$ch: removal raised conversion")
      assert(eff >= 0L && eff <= 1000000L, s"$ch: effect out of range")
      assert(ch != "FULL" && ch != "purchase" && ch != "start")
    }
  }

  test("source drift TV distance is symmetric-complete and bounded") {
    val rows = Queries.all("q_source_drift_tv")(spark, sf)
      .select(col("s1"), col("s2"), col("tv_e6")).as[(String, String, Long)].collect()
    // 20 sources -> 190 unordered pairs, every tv in [0, 1e6]
    assert(rows.length == 190)
    rows.foreach { case (a, b, tv) =>
      assert(a < b)
      assert(tv >= 0L && tv <= 1000000L)
    }
  }

  test("item CF keeps at most 5 similar items, cosine-squared bounded") {
    val rows = Queries.all("q_item_cf")(spark, sf)
      .select(col("i1"), col("cos2_e6")).as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) => assert(g.length <= 5) }
    rows.foreach { case (_, c2) => assert(c2 >= 0L && c2 <= 1000000L) }
  }

  test("STL-lite decomposition reassembles exactly: v = trend + seas + resid") {
    val rows = Queries.all("q_stl_lite")(spark, sf)
      .select(col("v"), col("trend"), col("seas"), col("resid"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, t, se, r) => assert(v == t + se + r) }
  }

  test("nearest-event join picks the true minimum |dt| per signup") {
    val t = Tables(spark, sf)
    val ev = t.events.select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val purchases = ev.filter(_._4 == "purchase").groupBy(_._1)
    val got = Queries.all("q_asof_nearest")(spark, sf)
      .select(col("user_id"), col("event_id"), col("abs_dt_us"))
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val sgTs = ev.filter(_._4 == "signup").map(e => e._2 -> (e._1, e._3)).toMap
    got.foreach { case (u, sid, adt) =>
      val (user, sts) = sgTs(sid)
      assert(user == u)
      val best = purchases(u).map(p => math.abs(sts - p._3)).min
      assert(adt == best, s"signup $sid: $adt != $best")
    }
  }

  test("winnow matches surface the genuinely overlapping doc pairs") {
    val rows = Queries.all("q_winnow_matches")(spark, sf)
      .select(col("a"), col("b"), col("shared")).as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { case (a, b, sh) => assert(a < b && sh >= 2) }
    // top pair shares a LOT of fingerprints — the planted near-dups
    assert(rows.map(_._3).max >= 10)
  }

  test("dHash fires on a gradient that aHash cannot see") {
    // ramp (every cell mean rising) -> all 60 dhash compare-bits set;
    // the flat doc -> none. Pure-ASCII (the docs->PPM fixture contract:
    // chars > 127 would become multi-byte UTF-8 pixels); 61 chars = one
    // char per cell.
    val ramp = (0 until 61).map(i => (i + 33).toChar).mkString
    val flat = "m" * 61
    val d = Seq((2L, ramp), (4L, flat)).toDF("doc_id", "text")
    val got = multimodal.Multimodal.differenceHash(
        multimodal.Multimodal.documentsAsPpm(d))
      .select(col("doc_id"), col("dhash")).as[(Long, Long)].collect().toMap
    assert(java.lang.Long.bitCount(got(2L)) == 60)
    assert(got(4L) == 0L)
  }

  test("growth accounting balances: DAU(d) = new + retained + resurrected") {
    val t = Tables(spark, sf)
    val dau = t.events.select(expr("ts div 86400000000").as("day"), col("user_id"))
      .distinct().groupBy(col("day")).agg(count(lit(1)).as("dau"))
      .as[(Long, Long)].collect().toMap
    val rows = Queries.all("q_growth_accounting")(spark, sf)
      .select(col("day"), col("new_users"), col("retained"), col("resurrected"), col("churned"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (d, nw, re, rs, _) => assert(nw + re + rs == dau(d)) }
    // second identity: DAU(d) = DAU(d-1) + new + resurrected - churned
    rows.sortBy(_._1).sliding(2).foreach {
      case Array(a, b) if b._1 == a._1 + 1 =>
        assert(dau(b._1) == dau(a._1) + b._2 + b._4 - b._5)
      case _ =>
    }
  }

  test("homophily index is bounded and consistent with its margins") {
    val r = Queries.all("q_graph_homophily")(spark, sf)
      .select(col("m"), col("same"), col("observed_e6"), col("expected_e6"), col("homophily_e6"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r._2 <= r._1)
    assert(r._3 >= 0 && r._3 <= 1000000L && r._4 >= 0 && r._4 <= 1000000L)
    assert(r._5 >= -1000000L && r._5 <= 1000000L)
  }

  test("square census counts C4s: one on a 4-cycle, three on K4") {
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val got1 = SignalQueries.squareCensus(c4).select(col("n_squares")).as[Long].head()
    assert(got1 == 1L)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val got3 = SignalQueries.squareCensus(k4).select(col("n_squares")).as[Long].head()
    assert(got3 == 3L)
  }
}
