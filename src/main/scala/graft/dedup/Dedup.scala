package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** Deduplication operators for document corpora — exact, MinHash+LSH,
  * SimHash, and n-gram-Jaccard — built entirely from codegen'd Column
  * expressions + joins (no UDFs, no driver-side loops).
  *
  * Scale notes (the whole point of LSH/banding): candidate generation is
  * a self-join on (band, bandHash) — an equi-join Catalyst shuffles on
  * the band key, so cost is O(docs·bands) + per-bucket pair blowup,
  * never the O(n²) all-pairs. Verification (true Jaccard) runs only on
  * candidates.
  */
object Dedup {

  /** Exact duplicate clusters on whitespace/case-normalized text:
    * (content hash, cluster size, canonical = min doc id). */
  def exactClusters(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        md5(lower(regexp_replace(trim(col(textCol)), "\\s+", " "))).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("dup_cnt"), min(col(idCol)).as("canonical"))

  /** Per-doc MinHash signature + shingle set. */
  def withMinhash(docs: DataFrame, shingleLen: Int, numHashes: Int,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), shingleSet(col(textCol), shingleLen).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

  /** LSH banding: one row per (doc, band) with the band's hash; candidate
    * pairs are docs sharing any (band, bandHash) bucket. */
  def lshCandidates(withSig: DataFrame, bands: Int, rowsPerBand: Int,
                    idCol: String = "doc_id"): DataFrame = {
    val banded = withSig.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
        .as(Seq("band", "bv")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("ida"), col(s"b.$idCol").as("idb"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: candidates verified by true
    * shingle Jaccard ≥ threshold. Output (a, b, jaccard) sorted.
    *
    * The signature frame is persisted before the self-joins: Spark
    * re-evaluates both sides of a self-join, and the md5 minhash subtree
    * is by far the most expensive expression in the engine — without the
    * persist it is computed ~5× (bench: 81s → ~20s at sf0.1). */
  def minhashDupPairs(docs: DataFrame, shingleLen: Int = 8, numHashes: Int = 16,
                      bands: Int = 4, threshold: Double = 0.3): DataFrame = {
    val sigs = withMinhash(docs, shingleLen, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = lshCandidates(sigs, bands, numHashes / bands)
    val sh = sigs.select(col("doc_id"), col("sh"))
    cands
      .join(sh.select(col("doc_id").as("ida"), col("sh").as("sha")), Seq("ida"))
      .join(sh.select(col("doc_id").as("idb"), col("sh").as("shb")), Seq("idb"))
      .withColumn("jac", jaccard(col("sha"), col("shb")))
      .filter(col("jac") >= threshold)
      .select(col("ida").as("a"), col("idb").as("b"),
        graft.sql.Exact.e6(col("jac")).as("jac_e6"))
      .orderBy(col("a"), col("b"))
  }

  /** Per-doc 32-bit SimHash fingerprints. */
  def simhashFingerprints(docs: DataFrame, shingleLen: Int = 8): DataFrame =
    docs.select(col("doc_id"),
      simhash32(shingleSet(col("text"), shingleLen)).as("simhash"))

  /** Near-dup pairs by word n-gram Jaccard, blocked by a grouping column
    * (e.g. source) to bound the pair space. */
  def ngramDupPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.1,
                    blockCol: String = "source"): DataFrame = {
    // persisted: both sides of the self-join would otherwise re-tokenize
    val tri = docs.select(col("doc_id"), col(blockCol).as("blk"),
      wordNgrams(tokens(col("text")), n).as("tri"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tri.as("x").join(tri.as("y"),
        col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
      .withColumn("jac", jaccard(col("x.tri"), col("y.tri")))
      .filter(col("jac") >= threshold)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        graft.sql.Exact.e6(col("jac")).as("jac_e6"))
      .orderBy(col("a"), col("b"))
  }

  /** Embedding-cosine near-duplicates: pairs whose rounded cosine ≥
    * threshold. Brute-force within the frame — callers LSH/block first at
    * scale (see graft.sim.Similarity). */
  def embeddingDupPairs(emb: DataFrame, threshold: Double = 0.95): DataFrame = {
    // precompute each vector's norm once — the naive per-pair cosine does
    // 3 dot products; this does 1 (dot) + 2 lookups, and the persisted
    // frame stops the self-join from recomputing the norm column
    val e = emb.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(graft.sim.Similarity.dot(col("embedding"), col("embedding"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos",
        graft.sim.Similarity.dot(col("x.embedding"), col("y.embedding")) /
          (col("x.nrm") * col("y.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        graft.sql.Exact.e4(col("cos")).as("rcos_e4"))
      .orderBy(col("a"), col("b"))
  }
}
