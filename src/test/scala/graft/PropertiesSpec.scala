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

  // --- PPM parser totality + round trip ---------------------------------

  test("decodePpm is total: arbitrary bytes never throw") {
    check("total", Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      Multimodal.decodePpm(bytes)
      true
    })
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
