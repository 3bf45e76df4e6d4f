package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // --- BM25 -------------------------------------------------------------

  test("bm25 reproduces the exact-rational hand computation") {
    // corpus: N=3 docs, A=9 tokens; query terms {x, y}
    val docs = Seq(
      (1L, "x x y"),       // L=3, tf(x)=2, tf(y)=1
      (2L, "x z z"),       // L=3, tf(x)=1
      (3L, "z z z")        // L=3, no hit
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25(docs, Seq("x", "y"), k = 10)
      .as[(Long, Long, Long)].collect()

    // idf_e6(x) = 3e6 // 2 = 1500000 ; idf_e6(y) = 3e6 // 1 = 3000000
    // den(tf, L) = 20*9*tf + 6*9 + 18*L*3 = 180*tf + 54 + 54*L
    def term(idf: Long, tf: Long, l: Long): Long = {
      val sat = tf * 44L * 9L * 1000000L / (180L * tf + 54L + 54L * l)
      idf * sat / 1000000L
    }
    val d1 = term(1500000L, 2L, 3L) + term(3000000L, 1L, 3L)
    val d2 = term(1500000L, 1L, 3L)
    assert(r.toSeq == Seq((1L, 2L, d1), (2L, 1L, d2)))
    assert(d1 > d2) // doc 1 matches both terms, higher tf
  }

  test("bm25 length normalization: same tf, longer doc scores lower") {
    val docs = Seq(
      (1L, "x a"),             // L=2
      (2L, "x a a a a a a a")  // L=8, same tf(x)=1
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25(docs, Seq("x"), k = 10)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(r(1L) > r(2L))
  }

  // --- hybrid RRF -------------------------------------------------------

  test("hybridRrf fuses a sparse and a dense rank list reciprocally") {
    // doc 0 is the query vector's own row (excluded from results).
    // dense ranks (cosine to v0): 1:[1,0] best, then 2, then 3.
    // sparse CUT list (terms {x}): only hit docs appear — 3 (tf=2) → 1,
    // 2 (tf=1) → 2; doc 1 has no hit and is ABSENT (rank 0, contributes
    // nothing) under the cut-list RRF spec.
    val docs = Seq(
      (0L, "z z"), (1L, "z z z"), (2L, "x z z"), (3L, "x x z")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.99f, 0.1f)),
      (2L, Array(0.5f, 0.8f)), (3L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val r = Retrieval.hybridRrf(docs, emb, Seq("x"), queryVecId = 0L, k = 10)
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = r.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // dense ranks: 1→1, 2→2, 3→3 ; sparse ranks: 3→1, 2→2, 1→absent(0)
    assert(byDoc(1L)._2 == 1L && byDoc(3L)._2 == 3L)
    assert(byDoc(3L)._1 == 1L && byDoc(1L)._1 == 0L)
    // profile (1,3) beats (2,2) — 1/(60+r) is convex:
    // 1e6//61 + 1e6//63 = 16393+15873 = 32266 > 2*(1e6//62) = 32258;
    // doc 1's single-list profile (–,1) = 16393 trails both.
    assert(byDoc(3L)._3 == 32266L && byDoc(2L)._3 == 32258L)
    assert(byDoc(1L)._3 == 16393L)
    // output ordering: rrf desc, doc_id tiebreak
    assert(r.map(_._1).toSeq == Seq(3L, 2L, 1L))
  }

  test("hybridRrf nCand cut bounds each list before fusion") {
    // With nCand=2 the dense list keeps only docs 1,2; doc 3 still tops
    // the sparse list. Doc 3's dense rank must be 0 (cut), not 3.
    val docs = Seq(
      (0L, "z z"), (1L, "z z z"), (2L, "x z z"), (3L, "x x z")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.99f, 0.1f)),
      (2L, Array(0.5f, 0.8f)), (3L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val r = Retrieval.hybridRrf(docs, emb, Seq("x"), queryVecId = 0L,
        k = 10, nCand = 2)
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = r.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(byDoc(3L) == ((1L, 0L, 16393L)))
    assert(byDoc(2L) == ((2L, 2L, 32258L)))
    assert(byDoc(1L) == ((0L, 1L, 16393L)))
    assert(r.map(_._1).toSeq == Seq(2L, 1L, 3L)) // doc_id breaks the tie
  }

  // --- MMR --------------------------------------------------------------

  test("mmrRerank diversifies: near-duplicate of the first pick is deferred") {
    // query=[1,0]; a(1) slightly best; b(2) nearly parallel to a
    // (sim ≈ 0.9998); c(3) equal relevance to b but reflected across the
    // query axis (sim to a ≈ 0.29). Greedy relevance would take a then
    // b-or-c by tiebreak; MMR must take a, then c (b's max-sim to a
    // erases 3·10⁴ of score, c keeps most of its relevance).
    val emb = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0.81f, 0.59f)),
      (2L, Array(0.8f, 0.6f)),
      (3L, Array(0.8f, -0.6f))
    ).toDF("vec_id", "embedding")
    val r = Retrieval.mmrRerank(emb, queryVecId = 0L, nCand = 3, k = 3)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.map(_._2).toSeq == Seq(1L, 3L, 2L))
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L)) // steps in order
    // step 1 score is 7*rel with no diversity penalty
    assert(r(0)._4 == 7L * r(0)._3)
  }

  // --- matryoshka truncation -------------------------------------------

  test("matryoshkaOverlap exposes prefix-truncation ranking loss") {
    import graft.sim.Similarity
    // q(0)=[1,0,0,1]; full-dim top1 is 2 (cos=1); the 2-d prefix ties
    // 1 and 2 at cos=1 and the n_id tiebreak picks 1 → overlap drops
    // from 1 to 0 at dim 2. Full dim is the control row (overlap = k).
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 1f)),
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.5f, 0f, 0f, 0.5f)),
      (3L, Array(0f, 1f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val r = Similarity.matryoshkaOverlap(emb, q, dims = Seq(2), fullDim = 4, k = 1)
      .as[(Long, Long, Long)].collect().toSeq
    // dim 2 overlap 0 → inner-join row disappears; dim 4 overlap 1
    assert(r == Seq((4L, 0L, 1L)))
  }

  // --- kNN graph --------------------------------------------------------

  test("knnGraph blocks candidates by cluster label") {
    import graft.sim.Similarity
    // v0's global nearest is v1 (cos≈1) but lives in the other cluster —
    // blocking must pick v2 (orthogonal, same cluster) instead
    val emb = Seq(
      (0L, Array(1f, 0f), "A"),
      (1L, Array(1f, 0.01f), "B"),
      (2L, Array(0f, 1f), "A"),
      (20L, Array(0.9f, 0.1f), "B")
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.knnGraph(emb, k = 1, sampleMod = 20L)
      .as[(Long, Long, Long)].collect().toSeq
    // sampled queries: vec_id 0 (cluster A) and 20 (cluster B)
    assert(r.map(t => t._1 -> t._2).toMap == Map(0L -> 2L, 20L -> 1L))
  }

  // --- duplicated spans -------------------------------------------------

  test("dupSpans flags cross-doc shared windows only") {
    val docs = Seq(
      (1L, "a b c d"),   // windows (n=3): "a b c", "b c d"
      (2L, "x b c d"),   // windows: "x b c", "b c d" → shares "b c d"
      (3L, "p q r s")    // no shared window → filtered out
    ).toDF("doc_id", "text")
    val r = Corpus.dupSpans(docs, n = 3).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 2L, 1L, 500000L), (2L, 2L, 1L, 500000L)))
  }

  test("dupSpanCut counts covered token positions, overlapping windows merged") {
    // n=3: docs 1 and 2 share windows "b c d" (doc1 i=2) and "c d e"
    // (doc1 i=3) → doc1 cut positions {2,3,4} ∪ {3,4,5} = 4 of 5 tokens
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "b c d x c d e"),
      (3L, "p q r s")
    ).toDF("doc_id", "text")
    val r = Corpus.dupSpanCut(docs, n = 3).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r(0) == ((1L, 5L, 4L, 200000L)))
    // doc2: dup windows at i=1 ("b c d") and i=5 ("c d e") → {1,2,3,5,6,7}
    assert(r(1) == ((2L, 7L, 6L, 142857L)))
    assert(r(2) == ((3L, 4L, 0L, 1000000L)))
  }

  test("dupSpans counts every duplicated instance, not distinct grams") {
    // doc 1 repeats the shared window twice → both instances count
    val docs = Seq(
      (1L, "b c d b c d"),  // windows: bcd, cdb, dbc, bcd → 2 dup instances
      (2L, "b c d")         // single window bcd
    ).toDF("doc_id", "text")
    val r = Corpus.dupSpans(docs, n = 3).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 4L, 2L, 500000L), (2L, 1L, 1L, 1000000L)))
  }

  // --- exact Jaccard join -----------------------------------------------

  test("jaccardJoin matches brute-force exact Jaccard at the threshold") {
    import graft.dedup.Dedup
    val sets = Seq(
      (1L, Seq("a", "b", "c", "d", "e")),
      (2L, Seq("a", "b", "c", "d", "f")),  // jac(1,2) = 4/6 = 0.667 < 0.8
      (3L, Seq("a", "b", "c", "d", "e")),  // jac(1,3) = 1.0
      (4L, Seq("x", "y", "z"))
    ).toDF("doc_id", "items")
    val r = Dedup.jaccardJoin(sets, thresholdPct = 80)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 3L, 5L, 5L, 1000000L)))
    // lower threshold admits the 2/3 pair — prefix filter must not lose it
    val r60 = Dedup.jaccardJoin(sets, thresholdPct = 60)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r60.map(t => (t._1, t._2)).toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(r60.find(t => t._1 == 1L && t._2 == 2L).get._5 == 666666L)
  }

  test("jaccardJoin asymmetric index prefix loses no pairs (randomized " +
    "brute-force parity)") {
    import graft.dedup.Dedup
    // clustered sets so near-duplicates actually exist: each doc mutates
    // a per-cluster base vocabulary a little
    val rnd = new scala.util.Random(83)
    val docs = (0 until 120).map { i =>
      val base = (0 until 30).map(j => s"t${i / 4}_$j")
      val mutated = base.filter(_ => rnd.nextInt(10) > 0) ++
        (0 until rnd.nextInt(4)).map(k => s"x${i}_$k")
      (i.toLong, mutated.distinct)
    }
    Seq(60, 80, 90).foreach { t =>
      val got = Dedup.jaccardJoin(docs.toDF("doc_id", "items"), t)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      val exp = (for {
        (a, sa) <- docs; (b, sb) <- docs if a < b
        inter = sa.toSet.intersect(sb.toSet).size.toLong
        uni = sa.size + sb.size - inter
        if inter * 100L >= uni * t
      } yield (a, b) -> ((inter, uni))).toMap
      assert(got == exp, s"threshold $t: got ${got.size} pairs, " +
        s"expected ${exp.size}")
    }
  }

  // --- DSIR scores ------------------------------------------------------

  test("dsirScores rank target-like documents above off-target ones") {
    val docs = Seq(
      (1L, "aa aa aa", true),   // target slice: all "aa"
      (2L, "bb bb bb", false),  // corpus-only token
      (3L, "aa aa bb", false),  // target-like mixture
      (4L, "bb bb bb", false)
    ).toDF("doc_id", "text", "tgt")
    val r = Corpus.dsirScores(docs, col("tgt"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    // "aa" dominates the target distribution → docs heavy in "aa" win
    assert(r(1L) > r(3L) && r(3L) > r(2L) && r(2L) == r(4L))
  }

  // --- Luhn scan --------------------------------------------------------

  test("luhnScan separates checksum-valid from invalid 16-digit runs") {
    val docs = Seq(
      (1L, "pay 4532015112830366 now"),        // Luhn-valid
      (2L, "ref 4532015112830367 thanks"),     // same digits, bad check
      (3L, "a 4532015112830366 b 4532015112830367 c"), // one of each
      (4L, "no numbers here")                  // filtered out
    ).toDF("doc_id", "text")
    val r = Corpus.luhnScan(docs).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L, 1L), (2L, 1L, 0L), (3L, 2L, 1L)))
  }

  // --- RAKE keywords ----------------------------------------------------

  test("rakeKeywords: dense-company words outscore isolated repeats") {
    // "a" at position 2 of a 5-token doc sees 3 neighbors within ±2
    // (positions 1, 3, 4) → deg 3 per occurrence, 6 over freq 2;
    // "z" appears in 1-token docs (deg 0 → absent from deg join)
    val docs = Seq(
      (1L, "x a y q r"), (2L, "p a w s t"), (3L, "z"), (4L, "z")
    ).toDF("doc_id", "text")
    val r = Corpus.rakeKeywords(docs, window = 2, topK = 20)
      .as[(String, Long, Long, Long)].collect()
    val byTok = r.map(t => t._1 -> t._4).toMap
    assert(byTok("a") == 3000000L)
    assert(!byTok.contains("z"))   // no co-occurrence → no score
  }

  // --- perceptual hash --------------------------------------------------

  test("perceptualHash: deterministic, sentinel on corrupt payload, drift-sensitive") {
    import graft.multimodal.Multimodal
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content with other letters entirely here"),
      (3L, "")
    ).toDF("doc_id", "text")
    val r = Multimodal.perceptualHash(Multimodal.documentsAsPpm(docs))
      .collect().map(p => p.doc_id -> ((p.n_px, p.phash))).toMap
    assert(r(1L)._1 > 0 && r(2L)._1 > 0)
    assert(r(1L)._2 != r(2L)._2) // different content → different spectrum
    assert(r(3L) == ((0L, -1L))) // empty pixel section → sentinel
    // corrupt (non-PPM) payload → (-1, -1)
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val rb = Multimodal.perceptualHash(bad).collect().head
    assert(rb.n_px == -1L && rb.phash == -1L)
    // deterministic
    val again = Multimodal.perceptualHash(Multimodal.documentsAsPpm(docs))
      .collect().map(p => p.doc_id -> ((p.n_px, p.phash))).toMap
    assert(again == r)
  }

  // --- entropy panel ----------------------------------------------------

  test("entropyPanel: floor-log2 entropy, exact on uniform and skewed sources") {
    val docs = Seq(
      (1L, "a a b b", "u"),        // uniform 2 types: H = 1 bit exactly
      (2L, "x x x x x x x y", "s") // skewed: c=7: ⌊log2(8/7)⌋=0; c=1: ⌊log2 8⌋=3
    ).toDF("doc_id", "text", "source")
    val r = Corpus.entropyPanel(docs).orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // s: T=8, types=2, top 7/8, entropy (7·0 + 1·3)/8 = 0.375
    assert(r(0) == (("s", 8L, 2L, 875000L, 375000L)))
    assert(r(1) == (("u", 4L, 2L, 500000L, 1000000L)))
  }

  // --- Gopher rules -----------------------------------------------------

  test("gopherRules: each rule fires independently and pass is their conjunction") {
    val good = "the quick brown fox jumps over a lazy dog near the riverbank today"
    val docs = Seq(
      (1L, good),                                   // all rules pass
      (2L, "the a short"),                          // < 10 words
      (3L, ("internationalization " * 12).trim),    // mean word len > 10
      (4L, "zz yy xx ww vv uu tt ss rr qq pp oo")   // no stopwords
    ).toDF("doc_id", "text")
    val r = Corpus.gopherRules(docs).orderBy("doc_id")
      .select("doc_id", "r_words", "r_wlen", "r_stop", "pass")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r(0) == ((1L, 1L, 1L, 1L, 1L)))
    assert(r(1)._2 == 0L && r(1)._5 == 0L)
    assert(r(2)._3 == 0L && r(2)._5 == 0L)
    assert(r(3)._4 == 0L && r(3)._5 == 0L)
  }

  // --- eval harness -----------------------------------------------------

  test("evalRanking: the tf ranking IS the ideal ranking → NDCG = 1") {
    // tf 3/2/1 → rel 2/1/0; rank order (by tf desc) equals ideal order
    val docs = Seq(
      (1L, "x x x"), (2L, "x x"), (3L, "x y")).toDF("doc_id", "text")
    val r = Retrieval.evalRanking(docs, Seq("x"), k = 10)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r._1 == "x" && r._2 == 2L)      // n_rel
    assert(r._3 == 2L)                     // hits@k
    assert(r._4 == 1000000L)               // first relevant at rank 1
    assert(r._5 == r._6)                   // DCG == IDCG
    assert(r._7 == 1000000L)               // NDCG exactly 1
  }

  test("evalRanking: a term with no relevant docs reports all-zero metrics") {
    val docs = Seq((1L, "z q"), (2L, "q r")).toDF("doc_id", "text")
    val r = Retrieval.evalRanking(docs, Seq("z"), k = 10)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r._2 == 0L && r._3 == 0L && r._4 == 0L && r._7 == 0L)
  }

  // --- TextRank ---------------------------------------------------------

  test("textRank: the path centre outranks the leaves, symmetrically") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = Retrieval.textRank(docs, vocab = 10, iters = 10, topK = 10)
      .as[(String, Long)].collect().toSeq
    val m = r.toMap
    assert(r.head._1 == "b")               // centre has max rank
    assert(m("a") == m("c"))               // leaves are symmetric
    assert(m("b") > m("a"))
  }
}
