package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of fixed-round label propagation: random
  * symmetrized graphs against an in-memory replay of the deterministic
  * contract — each round every vertex adopts the most frequent
  * in-neighbor label with ties to the SMALLEST label, no-in-edge
  * vertices keep theirs. The struct-max argmax trick ((c, −lbl) max =
  * mode-min-label) is exactly the kind of encoding a fixture can pass
  * while a tie-heavy random multigraph breaks, so the generator keeps
  * parallel edges (each edge ROW is one vote, both engines). */
class LpaPropertySpec extends SparkSpec {
  import spark.implicits._

  private def lpaRef(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val in = edges.groupBy(_._2)
    var lbl = verts.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lbl = verts.map { v =>
        in.get(v) match {
          case None => v -> lbl(v)
          case Some(es) =>
            val votes = es.groupBy(e => lbl(e._1)).map { case (l, xs) => (l, xs.size) }
            // mode with min-label tie-break
            v -> votes.toSeq.maxBy { case (l, c) => (c.toLong, -l) }._1
        }
      }.toMap
    }
    lbl
  }

  test("lpa equals the in-memory mode-min-label replay on random graphs") {
    val gen = for {
      n <- Gen.choose(3, 25)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { raw =>
      // symmetrize ROW-WISE (keep duplicates): votes must match 1:1
      val sym = raw.flatMap(e => Seq(e, e.swap))
      val rows = Algos.lpa(sym.toDF("src", "dst"), rounds = 3)
        .as[(Long, Long)].collect()
      val got = rows.toMap
      val want = lpaRef(sym, rounds = 3)
      val ok = rows.length == got.size && got == want
      if (!ok) {
        System.err.println(s"MISMATCH sym=$sym\n got=$got\n want=$want")
      }
      ok
    }
    val r = SCTest.check(
      propParams(1229L, 10),
      prop)
    assert(r.passed, s"lpa vs in-memory replay: ${r.status}")
  }
}
