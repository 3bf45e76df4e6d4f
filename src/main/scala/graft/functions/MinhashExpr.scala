package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature as a native Catalyst expression.
  *
  * Semantics (the DuckDB oracle replays exactly this): hash a =
  * md5(a || ":" || shingle) for a in 0..⌈numHashes/4⌉−1; each md5 yields
  * four independent 8-hex-digit words; signature entry j = lexicographic
  * min over shingles of word j%4 of hash ⌊j/4⌋ (fixed-width lowercase
  * hex, so string min == unsigned numeric min).
  *
  * Why an Expression and not composed Columns: the declarative form
  * (transform/array_min over a pre-split word pool) allocates an
  * intermediate word array per (row, entry) — ~190M UTF8String
  * allocations at sf0.1 — and re-evaluates the md5 pool per entry when
  * CollapseProject inlines it. This expression walks the shingle array
  * once per row, computes ⌈numHashes/4⌉ digests per shingle, and folds
  * the mins in local arrays — no intermediate structure at all.
  * CodegenFallback is fine here: the per-row work (hundreds of md5s)
  * dwarfs the fallback's boxing overhead, and the surrounding projection
  * still codegens. Measured 2.5× faster than the best declarative
  * arrangement on q_dedup_minhash at sf0.1.
  */
case class MinhashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  private val numMd5 = (numHashes + 3) / 4

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MinhashSignature.digest.get()
    val mins = new Array[String](numHashes)
    var i = 0
    while (i < n) {
      val sBytes = arr.getUTF8String(i).getBytes
      var a = 0
      while (a < numMd5) {
        md.reset()
        md.update((a.toString + ":").getBytes("US-ASCII"))
        md.update(sBytes)
        val hex = hexString(md.digest())
        var b = 0
        var j = a * 4
        while (b < 4 && j < numHashes) {
          val w = hex.substring(b * 8, b * 8 + 8)
          if (mins(j) == null || w.compareTo(mins(j)) < 0) mins(j) = w
          b += 1; j += 1
        }
        a += 1
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(m => if (m == null) null else UTF8String.fromString(m))
        .asInstanceOf[Array[Any]])
  }

  private def hexString(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  /** One digest per executor thread, reset per use — getInstance runs a
    * provider lookup + allocation, measurably hot at one per ROW. */
  private[graft] val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}

/** One-pass 60-bit SimHash over a shingle-set column.
  *
  * Semantics (oracle-replayable): bit j (0 ≤ j < 60) is set when the
  * majority of shingles (count·2 ≥ n, the same tie rule as the 32-bit
  * variant) have bit j%4 set in the VALUE of hex digit ⌊j/4⌋ of md5(s).
  * 60 bits = 15 hex digits — wide enough that LSH bands over the
  * fingerprint stay discriminating even on statistically-similar corpora
  * (a 32-bit fingerprint's band values concentrate and explode the
  * candidate join), while staying inside a positive BIGINT in both
  * engines (bit 63 would overflow DuckDB's POWER(2, j) BIGINT cast).
  *
  * Native expression for the same reason as [[MinhashSignature]]: one md5
  * + 60 local counter bumps per shingle, no per-bit re-hash.
  */
case class Simhash60(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MinhashSignature.digest.get()
    md.reset()
    val cnt = new Array[Int](60)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < 60) {
        val p = j / 4 // hex digit index; digit p = nibble of byte p/2
        val v =
          if ((p & 1) == 0) (d(p / 2) >> 4) & 0xf
          else d(p / 2) & 0xf
        cnt(j) += (v >> (j % 4)) & 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (cnt(j) * 2 >= n) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash60 =
    copy(child = newChild)
}
