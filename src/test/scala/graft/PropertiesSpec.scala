package graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.pipeline.Corpus

/** ScalaCheck properties over the engine's pure kernels (no SparkSession
  * in the loop — these are the pieces whose contracts are algebraic:
  * parsers must be total, packers must respect their invariants, native
  * expressions must match their specification arithmetic). */
class PropertiesSpec extends AnyFunSuite {

  private def check(name: String, p: Prop, minTests: Int = 100): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(minTests), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  // --- CDC chunker invariants -------------------------------------------

  test("cdcBoundaries: chunks tile any text and respect min/max for any params") {
    val gen = for {
      text <- Gen.asciiPrintableStr
      minLen <- Gen.choose(1, 10)
      maxLen <- Gen.choose(10, 60)
      div <- Gen.choose(2, 40)
    } yield (text, minLen, maxLen, div)
    check("tile", Prop.forAll(gen) { case (text, minLen, maxLen, div) =>
      val ends = graft.dedup.Dedup.cdcBoundaries(text, div = div, rem = div - 1,
        minLen = minLen, maxLen = maxLen)
      val tiled = text.isEmpty || ends.lastOption.contains(text.length)
      val sorted = ends == ends.sorted && ends.distinct == ends
      val lens = (0 +: ends.dropRight(1)).zip(ends).map { case (s, e) => e - s }
      // every chunk except the trailing remainder honors [minLen, maxLen]
      val bounded = lens.dropRight(1).forall(l => l >= minLen && l <= maxLen) &&
        lens.lastOption.forall(_ <= maxLen)
      tiled && sorted && bounded
    })
  }

  // --- PPM parser totality + round trip ---------------------------------

  test("decodePpm is total: arbitrary bytes never throw") {
    check("total", Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      Multimodal.decodePpm(bytes)
      true
    })
  }

  test("decodeWav is total: arbitrary bytes never throw") {
    val riffish = for {
      junk <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
      prefix <- Gen.oneOf(Array.emptyByteArray, "RIFF".getBytes("US-ASCII"),
        "RIFF\u0000\u0000\u0000\u0000WAVE".getBytes("US-ASCII"))
    } yield prefix ++ junk
    check("total", Prop.forAll(riffish) { bytes =>
      Multimodal.decodeWav(bytes) // hostile sizes/truncation → None, never a throw
      true
    })
  }

  test("decodeWav round-trips arbitrary valid parameters") {
    val p = Prop.forAll(
      Gen.choose(1, 8), Gen.choose(1, 192000), Gen.oneOf(8, 16, 24, 32),
      Gen.choose(0, 500), Gen.oneOf(0, 2, 5, 6, 9, 10)) { (ch, rate, bits, ns, junk) =>
      val enc = Multimodal.encodeWav(ch, rate, bits, ns, junk)
      Multimodal.decodeWav(enc).contains((ch, rate, bits, ns.toLong * ch * (bits / 8)))
    }
    check("roundtrip", p)
  }

  test("decodePpm round-trips arbitrary constructed headers") {
    val dim = Gen.choose(0, 999999999)
    val ws = Gen.nonEmptyListOf(Gen.oneOf(" ", "\n", "\t", "\r", "# c\n")).map(_.mkString)
    val p = Prop.forAll(dim, dim, Gen.choose(1, 65535), ws, ws, ws) {
      (w, h, mv, s1, s2, s3) =>
        val payload = s"P6$s1$w$s2$h$s3$mv\nPIXELS".getBytes("US-ASCII")
        Multimodal.decodePpm(payload).contains((w, h, mv))
    }
    check("roundtrip", p)
  }

  // --- greedy packer invariants ----------------------------------------

  private val blockGen = for {
    block <- Gen.oneOf("a", "b", "c")
    sizes <- Gen.listOf(Gen.choose(1L, 30L))
  } yield (block, sizes)

  /** Rows pre-sorted by (block, id) — the order greedyPack guarantees. */
  private val rowsGen: Gen[List[(Long, String, Long)]] =
    Gen.listOf(blockGen).map { blocks =>
      var id = -1L
      blocks.sortBy(_._1).flatMap { case (b, sizes) =>
        sizes.map { n => id += 1; (id, b, n) }
      }
    }

  test("greedy packing respects budget, contiguity, and id preservation") {
    val p = Prop.forAll(rowsGen, Gen.choose(5L, 60L)) { (rows, budget) =>
      val out = Corpus.packIterator(rows.iterator, budget).toList
      val byBin = out.groupBy(r => (r.block, r.bin))
      val budgetOk = byBin.values.forall { bin =>
        bin.map(_.n_tokens).sum <= budget || bin.length == 1 // oversized solo
      }
      val contiguous = out.groupBy(_.block).values.forall { rs =>
        val bins = rs.map(_.bin)
        bins.head == 0L && bins.zip(bins.tail).forall { case (a, b) => b == a || b == a + 1 }
      }
      val idsOk = out.map(_.doc_id) == rows.map(_._1)
      budgetOk && contiguous && idsOk
    }
    check("pack", p)
  }

  // --- native expressions match their specification arithmetic ----------

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def evalOn(shingles: Seq[String],
                     mk: org.apache.spark.sql.catalyst.expressions.Expression =>
                       org.apache.spark.sql.catalyst.expressions.Expression): Any = {
    val arr = new GenericArrayData(
      shingles.map(s => UTF8String.fromString(s)).toArray[Any])
    mk(Literal.create(arr, ArrayType(StringType))).eval(null)
  }

  private val shinglesGen =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
      .map(_.distinct)

  test("MinhashSignature equals the per-word md5-min specification") {
    val p = Prop.forAll(shinglesGen) { sh =>
      val got = evalOn(sh, e => graft.functions.MinhashSignature(e, 16))
        .asInstanceOf[ArrayData]
      (0 until 16).forall { j =>
        val expect = sh.map(s => md5Hex(s"${j / 4}:$s").substring((j % 4) * 8, (j % 4) * 8 + 8)).min
        got.getUTF8String(j).toString == expect
      }
    }
    check("minhash", p, minTests = 50)
  }

  test("Simhash60 equals the hex-digit majority specification") {
    val p = Prop.forAll(shinglesGen) { sh =>
      val got = evalOn(sh, e => graft.functions.Simhash60(e)).asInstanceOf[Long]
      val n = sh.length
      val expect = (0 until 60).map { j =>
        val cnt = sh.count { s =>
          val digit = Integer.parseInt(md5Hex(s).substring(j / 4, j / 4 + 1), 16)
          ((digit >> (j % 4)) & 1) == 1
        }
        if (cnt * 2 >= n) 1L << j else 0L
      }.sum
      got == expect && (got >> 60) == 0L
    }
    check("simhash", p, minTests = 50)
  }
}
