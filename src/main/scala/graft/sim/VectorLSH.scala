package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH over embedding columns (SimHash for vectors,
  * Charikar STOC'02): bucket bit j = sign(v · h_j) for a deterministic
  * ±1 hyperplane h_j. Pairs agreeing on all bits of any *band* become
  * candidates, so near-dup candidate generation is an equi-join on
  * (band, bucket) — never the all-pairs nested-loop.
  *
  * Determinism discipline: the hyperplane sign matrix is derived from
  * md5("plane:dim") at plan-build time and embedded as *literals* in both
  * the Spark plan and the DuckDB oracle (see [[signsSqlLiteral]]) — the
  * two engines multiply the same ±1.0 constants against the same floats
  * in the same index order, so every bucket bit is bit-identical.
  * Multiplying by ±1.0 is exact in IEEE754, and both engines left-fold
  * the double sum, so there is no float-drift risk in the sign test.
  */
object VectorLSH {

  /** Deterministic ±1 hyperplane matrix: sign(j, i) = +1 iff the first
    * hex digit of md5("j:i") is odd — the same seeded-md5 discipline as
    * TextFunctions.minhashSignature / io.Generators. */
  def signs(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim) { (j, i) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$i".getBytes("UTF-8"))
      if (((d(0) >> 4) & 1) == 1) 1.0 else -1.0
    }

  /** v · s for a literal hyperplane, accumulated in double in index order
    * (reproducible across engines). */
  private def dotLit(vec: Column, s: Array[Double]): Column =
    aggregate(zip_with(vec, typedlit(s), (x, w) => x.cast("double") * w),
      lit(0.0), (acc, v) => acc + v)

  /** One bucket id per band: band b's bucket packs the sign bits of
    * hyperplanes [b·r, (b+1)·r) into a BIGINT. Returns array<bigint> of
    * length `bands`. */
  def bandBuckets(vec: Column, s: Array[Array[Double]],
                  bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      (0 until rowsPerBand).map { t =>
        when(dotLit(vec, s(b * rowsPerBand + t)) >= 0, lit(1L << t))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  /** The sign matrix as a DuckDB 2-D list literal (DOUBLE[][]) — the
    * oracle twin of the `typedlit` arrays inside [[bandBuckets]]. */
  def signsSqlLiteral(s: Array[Array[Double]]): String =
    s.map(_.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")

  /** DuckDB twin of [[bandBuckets]] for one band: `bandVar` is the band
    * index column/lambda var, `sm` must be bound to [[signsSqlLiteral]].
    * 1-indexed lists; CAST(POWER) is exact for rowsPerBand ≤ 53 bits. */
  def bucketSql(vecCol: String, dim: Int, rowsPerBand: Int, bandVar: String): String =
    s"list_sum(list_transform(range(0, $rowsPerBand), t -> " +
      s"CASE WHEN list_sum(list_transform(range(1, ${dim + 1}), i -> " +
      s"CAST($vecCol[i] AS DOUBLE) * sm[$bandVar * $rowsPerBand + t + 1][i])) >= 0 " +
      s"THEN CAST(POWER(2, t) AS BIGINT) ELSE CAST(0 AS BIGINT) END))"
}
