package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Similarity
import graft.text.TextFunctions

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "s1"),
    (2L, "the quick brown fox jumps over the lazy cat", "s1"),
    (3L, "completely different content entirely here now", "s1"),
    (4L, "the quick brown fox jumps over the lazy dog", "s2") // exact dup of 1
  ).toDF("doc_id", "text", "source")

  test("exact dedup clusters identical normalized text") {
    val c = Dedup.exactClusters(docs).filter(col("dup_cnt") > 1)
    assert(c.count() == 1)
    assert(c.first().getAs[Long]("canonical") == 1L)
  }

  test("minhash LSH finds near-duplicate pair and exact pair") {
    val pairs = Dedup.minhashDupPairs(docs).as[(Long, Long, Long)].collect().toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 4L)))    // identical → jaccard 1.0
    assert(keys.contains((1L, 2L)))    // near dup
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    assert(pairs.find(p => (p._1, p._2) == ((1L, 4L))).get._3 == 1000000L)
  }

  test("simhash is equal for identical docs, different for unrelated") {
    val fp = Dedup.simhashFingerprints(docs).as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(4L))
    assert(fp(1L) != fp(3L))
  }

  test("ngram jaccard blocks by source") {
    val pairs = Dedup.ngramDupPairs(docs, n = 2, threshold = 0.1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)).contains((1L, 2L)))
    // 1 and 4 are in different sources → blocked apart
    assert(!pairs.map(p => (p._1, p._2)).contains((1L, 4L)))
  }

  test("embedding LSH dedup finds the planted near-identical pair, and only it") {
    val v1 = Seq(0.9f, 0.1f, 0.3f, -0.5f, 0.2f, 0.7f, -0.1f, 0.4f)
    val v2 = v1.updated(0, v1.head * 0.5f) // halved coord 0: cosine ≈ 0.953
    val v3 = Seq(-0.8f, 0.6f, -0.2f, 0.1f, -0.9f, 0.3f, 0.5f, -0.4f)
    val v4 = Seq(0.05f, -0.85f, 0.4f, 0.6f, 0.1f, -0.3f, 0.9f, 0.2f)
    val e = Seq((1L, v1), (2L, v2), (3L, v3), (4L, v4)).toDF("vec_id", "embedding")
    val got = Dedup.embeddingDupPairs(e, threshold = 0.9, numPlanes = 16, bands = 4, dim = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(got.head._3 >= 9000L && got.head._3 < 10000L) // genuine near-dup, not a clone
  }

  test("cosine similarity: identical vectors score 1, orthogonal 0") {
    val e = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val q = e.filter(col("vec_id") === 1).select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val top = Similarity.bruteTopK(e.select("vec_id", "embedding"), q, 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(top.head == ((1L, 2L, 10000L)))
    assert(top(1) == ((1L, 3L, 0L)))
  }

  test("ivf probes restrict search to nearest clusters") {
    val e = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.1f, 0.9f), 1)).toDF("vec_id", "embedding", "label")
    val q = e.filter(col("vec_id") === 1).select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val got = Similarity.ivfTopK(e, q, k = 1, nprobe = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(2L)) // only cluster 0 probed
  }

  test("text functions compute deterministic stats") {
    val r = docs.select(
      TextFunctions.tokenCount(col("text")).as("t"),
      TextFunctions.uniqueTokenCount(col("text")).as("u"),
      TextFunctions.wordHits(col("text"), Seq("the")).as("s"))
      .orderBy(col("t").desc).first()
    assert(r.getAs[Long]("t") == 9L)
    assert(r.getAs[Long]("u") == 8L)
    assert(r.getAs[Long]("s") == 2L)
  }

  test("multimodal decode stub yields stable metadata and frame sampling explodes") {
    val media = Multimodal.documentsAsMedia(docs.select("doc_id", "text"))
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length == 4)
    val m1 = meta.find(_.doc_id == 1L).get
    val m4 = meta.find(_.doc_id == 4L).get
    assert(m1.content_md5 == m4.content_md5 && m1.width == m4.width)
    assert(m1.n_bytes == "the quick brown fox jumps over the lazy dog".length)
    val frames = Multimodal.sampleFrames(media, chunk = 8, stride = 2)
    assert(frames.count() > 4)
  }
}
