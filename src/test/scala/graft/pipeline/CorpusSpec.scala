package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a b a b", "s1"),             // 5 grams: "a b"×3, "b a"×2
    (2L, "w x y z w x", "s1"),             // 5 grams: "w x"×2, rest unique
    (3L, "one two three four five six", "s2")
  ).toDF("doc_id", "text", "source")

  test("repetition stats count duplicate and top 2-grams exactly") {
    val r = Corpus.repetitionStats(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // doc 1: grams = [a b, b a, a b, b a, a b] → n=5, uniq=2, top=3
    assert(r(0) == ((1L, 5L, 2L, 3L, 600000L, 600000L)))
    // doc 2: grams = [w x, x y, y z, z w, w x] → n=5, uniq=4, top=2
    assert(r(1) == ((2L, 5L, 4L, 2L, 400000L, 200000L)))
    // doc 3: all unique → top_frac 1/5, dup_frac 0
    assert(r(2) == ((3L, 5L, 5L, 1L, 200000L, 0L)))
  }

  test("repetition stats survive docs shorter than the n-gram width") {
    // 1-token doc: ANSI mode (Spark 4 default) makes element_at throw
    // out-of-range; try_element_at + concat_ws NULL-skip must yield the
    // single truncated gram instead — matching the oracle's NULL-skip
    val short = Seq((1L, "solo", "s1"), (2L, "a b", "s1")).toDF("doc_id", "text", "source")
    val r = Corpus.repetitionStats(short).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r(0) == ((1L, 1L, 1L, 1L, 1000000L, 0L))) // gram = "solo"
    assert(r(1) == ((2L, 1L, 1L, 1L, 1000000L, 0L))) // gram = "a b"
  }

  test("exact-K sample keeps exactly k per stratum, deterministically, with payload") {
    val d = (0L until 40L).map(i => (i, s"text $i", if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val s1 = Corpus.sampleExactK(d, k = 5)
    assert(s1.groupBy("source").count().collect().forall(_.getLong(1) == 5))
    assert(s1.columns.contains("text")) // payload survives
    // pure function of the data: same members on re-run and re-partition
    val ids1 = s1.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Corpus.sampleExactK(d.repartition(7), k = 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // k larger than a stratum: whole stratum kept, no crash
    assert(Corpus.sampleExactK(d, k = 100).count() == 40)
  }

  test("tf-idf ranks rare tokens above corpus-wide ones") {
    val d = Seq(
      (1L, "common rare1 rare1 common"),
      (2L, "common rare2"),
      (3L, "common other")).toDF("doc_id", "text")
    val top = Corpus.tfIdfTopK(d, k = 1)
      .select("doc_id", "token").as[(Long, String)].collect().toMap
    // "common" has df=3 → score tf·3e6/3; each rare token df=1 → tf·3e6,
    // which beats "common" at equal tf
    assert(top(1L) == "rare1" && top(2L) == "rare2" && top(3L) == "other")
  }

  test("vocabulary counts occurrences and doc frequency") {
    val v = Corpus.vocabulary(docs, topN = 2)
      .as[(String, Long, Long)].collect()
    // "a" and "b" appear 3× each in doc 1 only; ties break by token
    assert(v(0) == (("a", 3L, 1L)) && v(1) == (("b", 3L, 1L)))
  }

  test("stratified sample is deterministic and respects per-stratum rates") {
    val many = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("text "), col("id")).as("text"),
      when(col("id") % 2 === 0, "s1").otherwise("s2").as("source"))
    val s1 = Corpus.stratifiedSample(many).cache()
    val s2 = Corpus.stratifiedSample(many)
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    // realized per-stratum rate tracks rate_permille within 5 points of
    // the binomial expectation (n=1000 per stratum)
    val rates = s1.groupBy("source", "rate_permille").count()
      .as[(String, Long, Long)].collect()
    rates.foreach { case (_, permille, kept) =>
      assert(math.abs(kept / 1000.0 - permille / 1000.0) < 0.05,
        s"kept $kept of 1000 at rate $permille")
    }
    s1.unpersist()
  }

  test("pii scrub counts and redacts planted emails and id runs") {
    val d = Seq(
      (1L, "reach me at jo.doe@corp.example or ref 123456 thanks"),
      (2L, "no pii here just words")).toDF("doc_id", "text")
    val r = Corpus.piiScrub(d).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(r(0)._2 == 1L && r(0)._3 == 1L)
    assert(r(1)._2 == 0L && r(1)._3 == 0L)
    // scrubbed md5 equals md5 of the hand-redacted string
    val expect = d.select(md5(lit("reach me at <EMAIL> or ref <ID> thanks")))
      .first().getString(0)
    assert(r(0)._4 == expect)
  }

  test("chunk packing assigns concat-and-split chunk/offset per block") {
    val d = Seq(
      (1L, "t1 t2 t3", "s1"),   // 3 tokens, start 0  → chunk 0 off 0
      (2L, "t1 t2 t3", "s1"),   // start 3            → chunk 0 off 3
      (3L, "t1 t2", "s1"),      // start 6            → chunk 1 off 2
      (4L, "t1", "s2")          // other block resets → chunk 0 off 0
    ).toDF("doc_id", "text", "source")
    val r = Corpus.chunkPack(d, budget = 4).orderBy("doc_id")
      .select("doc_id", "chunk", "offset").as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 3L), (3L, 1L, 2L), (4L, 0L, 0L)))
  }

  test("greedy packing never splits docs and opens bins on overflow") {
    val d = Seq(
      (1L, "t1 t2 t3", "s1"),       // bin 0 (fill 3)
      (2L, "t1 t2", "s1"),          // 3+2 > 4 → bin 1 (fill 2)
      (3L, "t1", "s1"),             // fits    → bin 1 (fill 3)
      (4L, "t1 t2 t3 t4 t5", "s1"), // oversized → bin 2 alone
      (5L, "t1", "s1"),             // bin 3
      (6L, "t1 t2 t3 t4", "s2")     // new block resets → bin 0
    ).toDF("doc_id", "text", "source")
    val r = Corpus.greedyPack(d, budget = 4).collect()
      .map(p => p.doc_id -> p.bin).toMap
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L, 6L -> 0L))
  }

  test("bpe merge kernel: left-to-right non-overlap, incl. equal-symbol runs") {
    assert(Corpus.mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Corpus.mergePair(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Corpus.mergePair(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(Corpus.mergePair(Seq("x"), "a", "b") == Seq("x"))
  }

  test("bpe training learns the classic low/lower merge table, ties broken lexically") {
    import spark.implicits._
    // tokens: low ×3, lower ×1. Round 1: (l,o)=4 ties (o,w)=4 → lex picks
    // (l,o). Round 2: (lo,w)=4. Round 3: (low,e)=1 ties (e,r)=1 → (e,r).
    // Round 4: (low,er)=1.
    val d = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val got = Corpus.bpeTrain(d, numMerges = 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((0, "l", "o", 4L), (1, "lo", "w", 4L),
      (2, "e", "r", 1L), (3, "low", "er", 1L)))
  }

  test("bpe encode applies the merge table in rank order across the doc") {
    import spark.implicits._
    val d = Seq((1L, "low lower")).toDF("doc_id", "text")
    val got = Corpus.bpeEncode(d, Seq(("l", "o"), ("lo", "w")))
      .as[(Long, Seq[String])].collect().head
    assert(got == ((1L, Seq("low", "low", "e", "r"))))
  }

  test("surprisal score: exact integer floor-log2 bits, hand-computed") {
    import spark.implicits._
    // counts: a=2, b=2, c=1; T=5. bits(a)=bits(b)=bitlen(5 div 2)−1=1,
    // bits(c)=bitlen(5)−1=2
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Corpus.surprisalScore(d).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 3L, 1000000L), (2L, 2L, 3L, 1500000L)))
  }

  test("floor(log2(a/b)) == bitlength(a div b) - 1 for every a >= b >= 1 grid point") {
    // the identity the surprisal operator rests on, checked exactly with
    // shifts (no doubles): k is correct iff b·2^k <= a < b·2^(k+1)
    for (a <- 1L to 300L; b <- 1L to a) {
      val k = 63 - java.lang.Long.numberOfLeadingZeros(a / b)
      assert((b << k) <= a && a < (b << (k + 1)), s"a=$a b=$b k=$k")
    }
  }

  test("markup strip: tags out, entities unescaped, whitespace collapsed") {
    import spark.implicits._
    val d = Seq(
      (1L, "<p>hello  <b>world</b></p> a&amp;b &lt;x&gt;"),
      (2L, "plain text")).toDF("doc_id", "text")
    val got = Corpus.stripMarkup(d).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val clean1 = "hello world a&b <x>"
    assert(got(0)._2 == 4L) // <p> <b> </b> </p>
    assert(got(0)._3 == clean1.length.toLong)
    val md5Plain = java.security.MessageDigest.getInstance("MD5")
      .digest("plain text".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    assert(got(1) == ((2L, 0L, 10L, md5Plain)))
  }

  test("bigram surprisal: conditional counts, hand-computed") {
    import spark.implicits._
    // cb: (a,b)=2 (b,a)=1 (a,c)=1; cp: a=3 b=1.
    // doc1 bits: (a,b)=bitlen(3 div 2)-1=0 ×2, (b,a)=bitlen(1)-1=0 → 0
    // doc2 bits: (a,c)=bitlen(3)-1=1
    val d = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = Corpus.bigramSurprisalScore(d).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 0L, 0L), (2L, 1L, 1L, 1000000L)))
  }

  test("contamination flags the planted eval copy and skips clean docs") {
    val corpus = Seq(
      (100L, "x1 x2 x3 x4 x5 x6", "s"),
      (101L, "totally different words over here ok", "s")).toDF("doc_id", "text", "source")
    val eval_ = Seq(
      (1L, "x1 x2 x3 x4 x5 x6", "s"),     // verbatim copy of train 100
      (2L, "clean benchmark sentence nothing shared", "s")).toDF("doc_id", "text", "source")
    val got = Corpus.contamination(corpus, eval_, n = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // all 4 of eval 1's 3-grams hit train 100 → overlap 100%
    assert(got == Seq((1L, 100L, 4L, 1000000L)))
  }

  test("mixing stats shares sum to ~1e6 and count tokens exactly") {
    val r = Corpus.mixingStats(docs).orderBy("source")
      .as[(String, Long, Long, Long)].collect()
    // s1: 2 docs 12 tokens; s2: 1 doc 6 tokens → shares 666666 / 333333
    assert(r.toSeq == Seq(("s1", 2L, 12L, 666666L), ("s2", 1L, 6L, 333333L)))
  }

  test("hashed linear score is the sum of per-token bucket weights") {
    import org.apache.spark.sql.functions.{col, explode}
    import graft.text.TextFunctions.tokens
    // independent recompute: per-token weights via the same md5 bucket
    // rule evaluated OUTSIDE the aggregation
    val perTok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"),
        (org.apache.spark.sql.functions.pmod(Corpus.md5Uniform(col("t")), lit(1024L)) % 17L - 8L).as("w"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = Corpus.hashedLinearScore(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Int)].collect()
    got.foreach { case (id, score, n, pos) =>
      assert(score == perTok(id).sum)
      assert(n == perTok(id).size)
      assert(pos == (if (score >= 0) 1 else 0))
    }
  }

  test("inverted index caps postings at the rank cap but counts full df") {
    val many = (1L to 30L).map(i => (i, "common uniq" + i, "s")).toDF("doc_id", "text", "source")
    val r = Corpus.invertedIndex(many, topN = 1, postingCap = 5)
      .as[(String, Long, String)].collect().head
    assert(r._1 == "common")
    assert(r._2 == 30L)                       // df counts ALL docs
    assert(r._3 == "1,2,3,4,5")               // postings capped at 5
  }

  test("temperature weights up-weight small strata relative to raw shares") {
    val r = Corpus.temperatureWeights(docs).orderBy("source")
      .as[(String, Long, Long, Long)].collect()
    // s1 12 tokens → w=floor(sqrt(12)*1000)=3464; s2 6 → 2449
    assert(r.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq(("s1", 12L, 3464L), ("s2", 6L, 2449L)))
    // α=1/2 share of s2 (41.4%) > raw token share (33.3%)
    assert(r(1)._4 > 333333L)
    // shares are floor-divided so they sum to ≤ 1e6
    assert(r.map(_._4).sum <= 1000000L)
  }

  test("collocations: a repeated pair outranks independent co-occurrence") {
    // "a b" always adjacent: ratio = N/4; "x y" co-occur once with
    // c_x = c_y = 3: ratio = N/9 — 2.25× lower
    val d = (Seq.fill(4)((1L, "a b")) ++ Seq(
      (2L, "x y"), (3L, "x q x w"), (4L, "y r y t"))).toDF("doc_id", "text")
    val r = Corpus.collocations(d, minCount = 1L, topK = 50)
      .select("gram", "c_xy", "pmi_ratio_e6")
      .as[(String, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r("a b")._1 == 4L)
    // N_bi = 11: "a b" → 11e6/4 = 2750000, "x y" → 11e6/9 = 1222222
    assert(r("a b")._2 == 2750000L)
    assert(r("x y")._2 == 1222222L)
  }

  test("hashFeatures: buckets stay in range and counts sum to token count") {
    val d = Seq((1L, "a b c a"), (2L, "d d")).toDF("doc_id", "text")
    val r = Corpus.hashFeatures(d, buckets = 8)
      .as[(Long, Long, Long)].collect()
    assert(r.forall(x => x._2 >= 0 && x._2 < 8))
    assert(r.filter(_._1 == 1L).map(_._3).sum == 4L)
    assert(r.filter(_._1 == 2L).map(_._3).sum == 2L)
    // same token always lands in the same bucket
    assert(r.count(_._1 == 2L) == 1)
  }
}
