package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Independent (non-replay) oracles for the pipeline operators whose
  * driver-gate oracle replays the same algorithm in DuckDB (round-8
  * verdict task 4): each test recomputes the expected result with a
  * FROM-SCRATCH in-memory implementation — dense power iteration for
  * TextRank, greedy scan for MMR, a direct MOSS winnower, brute-force
  * all-pairs truth for SemDeDup — so an algorithmic bug mirrored into
  * the SQL oracle cannot hide. */
class PipelineOracleSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }
  private def e4(x: Double): Long = math.floor(x * 10000L).toLong

  test("textRank matches an in-memory dense power iteration") {
    val texts = Seq(
      (1L, "spark graph engine runs spark jobs"),
      (2L, "graph engine state lives in spark"),
      (3L, "engine jobs shuffle state across spark executors"),
      (4L, "executors shuffle graph state"),
      (5L, "jobs runs jobs runs jobs"))
    val iters = 4
    val topK = 8
    val got = graft.pipeline.Retrieval.textRank(
        texts.toDF("doc_id", "text"), vocab = 100, iters = iters, topK = topK)
      .as[(String, Long)].collect().toSeq

    // from scratch: adjacent-distinct-token edges, dedup (min, max),
    // symmetric; pr over tokens with ≥1 edge; integer damped iteration
    val docsTok = texts.map { case (_, t) => t.trim.split("\\s+").toSeq }
    val undirected = docsTok.flatMap(ts => ts.zip(ts.drop(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (Seq(a, b).min, Seq(a, b).max) }.distinct
    val edges = undirected ++ undirected.map(_.swap)
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr = deg.keys.map(_ -> 1000000L).toMap
    (0 until iters).foreach { _ =>
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum
      }
      pr = pr.keys.map(t => t -> (150000L + 850L * contrib.getOrElse(t, 0L) / 1000L)).toMap
    }
    val exp = pr.toSeq.sortBy { case (t, p) => (-p, t) }.take(topK)
      .sortBy { case (t, p) => (-p, t) }
    assert(got == exp, s"got $got\nexp $exp")
  }

  test("mmrRerank matches an in-memory greedy maximal-marginal scan") {
    // 12 vectors in 4-d: a tight relevant cluster plus spread-out others,
    // so relevance and diversity genuinely compete
    val vecs: Seq[(Long, Array[Float])] = (0 until 12).map { i =>
      val base = i % 4
      val arr = Array.fill(4)(0.05f * ((i * 7 + 3) % 5))
      arr(base) = 1f + 0.1f * (i / 4)
      (i.toLong, arr)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val qId = 0L
    val nCand = 8
    val k = 4
    val got = graft.pipeline.Retrieval.mmrRerank(emb, qId, nCand, k)
      .as[(Long, Long, Long, Long)].collect().toSeq

    val qv = vecs.find(_._1 == qId).get._2
    val rel = vecs.filter(_._1 != qId)
      .map { case (id, v) => (id, e4(cos(qv, v)), v) }
    val cand = rel.sortBy { case (id, r, _) => (-r, id) }.take(nCand)
    var picked = Vector.empty[(Long, Long, Long)] // (id, rel, mmr)
    (1 to k).foreach { _ =>
      val rest = cand.filterNot(c => picked.exists(_._1 == c._1))
      val scored = rest.map { case (id, r, v) =>
        val mmr =
          if (picked.isEmpty) 7L * r
          else {
            val maxsim = picked.map(p =>
              e4(cos(v, cand.find(_._1 == p._1).get._3))).max
            7L * r - 3L * maxsim
          }
        (id, r, mmr)
      }
      picked :+= scored.minBy { case (id, _, m) => (-m, id) }
    }
    val exp = picked.zipWithIndex.map { case ((id, r, m), i) =>
      (i + 1L, id, r, m)
    }
    assert(got == exp, s"got $got\nexp $exp")
  }

  test("winnowPanel matches a direct MOSS winnower (k=8, w=4)") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaaa"),        // all k-grams identical
      (3L, "short"),                   // < k chars → empty panel
      (4L, "the quick brown fox jumps over the lazy dog again and again"),
      (5L, "abcdefgh"))                // exactly one k-gram
    val got = graft.SignalQueries.winnowPanel(texts.toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect().toSeq

    val exp = texts.map { case (id, t) =>
      if (t.length < 8) (id, 0L, 0L, "")
      else {
        val hs = (1 to t.length - 7).map(p =>
          md5hex(t.substring(p - 1, p + 7)) +
            ("%09d".format(100000000L - p)))
        val windows = 1 to math.max(hs.size - 3, 1)
        val sel = windows.map(w => hs.slice(w - 1, w - 1 + 4).min).distinct
        (id, hs.size.toLong, sel.size.toLong,
          sel.map(_.substring(0, 32)).min)
      }
    }
    assert(got == exp.sortBy(_._1), s"got $got\nexp $exp")
  }

  test("semanticDupPairs recovers exactly the planted clusters " +
    "(brute-force all-pairs truth)") {
    // 3 planted clusters of 6 vectors in 6-d: within-cluster cosine
    // ≈ 0.999, cross-cluster ≈ 0.01 — and the k-means seeds (the 3
    // smallest vec_ids) land one per cluster by construction
    val vecs: Seq[(Long, Array[Float])] = (0 until 18).map { i =>
      val c = i % 3
      val arr = Array.fill(6)(0.0f)
      arr(c) = 1f
      arr(3 + c) = 0.02f * (i / 3) // small within-cluster spread
      (i.toLong, arr)
    }
    val got = graft.sim.Similarity.semanticDupPairs(
        vecs.toDF("vec_id", "embedding"), k = 3, iters = 2, thresholdE4 = 9000L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet

    // independent truth: brute-force over ALL pairs, no clustering
    val truth = (for {
      (a, va) <- vecs; (b, vb) <- vecs if a < b
      if e4(cos(va, vb)) >= 9000L
    } yield (a, b)).toSet
    // the planted geometry puts every within-cluster pair above the
    // threshold and every cross pair far below it
    assert(truth.size == 3 * 15, s"planted truth degenerate: ${truth.size}")
    assert(truth.forall { case (a, b) => a % 3 == b % 3 })
    assert(got == truth,
      s"missing=${(truth -- got).take(5)} extra=${(got -- truth).take(5)}")
  }
}
