package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic graph generators, mirroring the reference's
  * benchmark inputs (SURVEY §2.1):
  *
  *  - uniform random: PseudoRandomVertexInputFormat
  *    (CORE/io/formats/PseudoRandomVertexInputFormat.java:48-92) — n
  *    vertices × d out-edges with uniform random targets;
  *  - small world: WattsStrogatzVertexInputFormat
  *    (CORE/io/formats/WattsStrogatzVertexInputFormat.java:49-113) — ring
  *    lattice with k neighbors, each rewired with probability beta.
  *
  * Randomness is `xxhash64(id, index, seed)` — a pure Catalyst expression,
  * so generation is deterministic per (id, seed), reproducible across
  * runs/partitionings (the reference seeds per-split for the same reason),
  * and embarrassingly parallel from `spark.range`.
  */
object Generators {

  /** Uniform random digraph: n vertices, d out-edges each. Self-loops are
    * remapped to (dst+1) mod n rather than dropped so out-degree is
    * exactly d. */
  def uniform(spark: SparkSession, n: Long, d: Int, seed: Long = 42L): DataFrame = {
    val raw = spark.range(n).select(col("id").as("src"),
        explode(sequence(lit(0), lit(d - 1))).as("i"))
      .select(col("src"), pmod(xxhash64(col("src"), col("i"), lit(seed)), lit(n)).as("dst"))
    raw.select(col("src"),
      when(col("dst") === col("src"), pmod(col("dst") + 1, lit(n))).otherwise(col("dst")).as("dst"))
  }

  /** Watts-Strogatz small world: ring lattice (k nearest neighbors
    * clockwise) with per-edge rewiring probability betaPermille/1000. */
  def wattsStrogatz(spark: SparkSession, n: Long, k: Int, betaPermille: Int,
                    seed: Long = 42L): DataFrame = {
    val ring = spark.range(n).select(col("id").as("src"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .select(col("src"), col("j"), pmod(col("src") + col("j"), lit(n)).as("ring_dst"))
    ring.select(col("src"),
      when(pmod(xxhash64(col("src"), col("j"), lit(seed)), lit(1000L)) < betaPermille,
        pmod(xxhash64(col("src"), col("j"), lit(seed + 1)), lit(n)))
        .otherwise(col("ring_dst")).as("dst"))
      .select(col("src"),
        when(col("dst") === col("src"), pmod(col("dst") + 1, lit(n))).otherwise(col("dst")).as("dst"))
  }
}
