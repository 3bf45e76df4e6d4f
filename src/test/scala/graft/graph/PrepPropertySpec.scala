package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property checks for the whole graph-preparation family
  * on ScalaCheck-random multigraphs vs in-memory set algebra: the Prep
  * ops are the load-time contract every algorithm builds on (the r11
  * symmetrize-guard work showed exactly how much rides on them), so
  * each gets the same randomized-oracle treatment as the kernels —
  * symmetric closure, mirror-only filtering, the clean pipeline
  * (dedup → symmetrize → drop loops), the isSymmetric predicate on
  * both true and false shapes, and coarsening with exact cross-cluster
  * multiplicities. */
class PrepPropertySpec extends SparkSpec {
  import spark.implicits._

  private val gen = for {
    n <- Gen.choose(2, 20)
    m <- Gen.choose(1, 3 * n)
    edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
  } yield edges

  private def run(name: String, seed: Long)(p: Seq[(Long, Long)] => Boolean): Unit = {
    val r = SCTest.check(
      propParams(seed, 10),
      Prop.forAll(gen) { edges =>
        val ok = p(edges)
        if (!ok) System.err.println(s"MISMATCH [$name] edges=$edges")
        ok
      })
    assert(r.passed, s"$name: ${r.status}")
  }

  test("makeSymmetric equals the symmetric closure as a set") {
    run("makeSymmetric", 1301L) { edges =>
      val got = Prep.makeSymmetric(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect()
      val want = edges.flatMap(e => Seq(e, e.swap)).distinct
      got.length == got.distinct.length && got.toSet == want.toSet
    }
  }

  test("removeAsymEdges keeps exactly the mirrored edge rows") {
    run("removeAsymEdges", 1302L) { edges =>
      val got = Prep.removeAsymEdges(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect()
      val set = edges.toSet
      // left_semi preserves left multiplicity: expected = all input ROWS
      // whose mirror exists somewhere
      val want = edges.filter(e => set(e.swap))
      got.sorted.toSeq == want.sorted
    }
  }

  test("cleanSymmetric = dedup + symmetric closure minus self loops") {
    run("cleanSymmetric", 1303L) { edges =>
      val got = Prep.cleanSymmetric(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect()
      val want = edges.flatMap(e => Seq(e, e.swap)).distinct.filter(e => e._1 != e._2)
      got.length == got.distinct.length && got.toSet == want.toSet
    }
  }

  test("isSymmetric agrees with the set definition on random shapes") {
    run("isSymmetric", 1304L) { edges =>
      val set = edges.toSet
      val want = set.forall(e => set(e.swap))
      Prep.isSymmetric(edges.toDF("src", "dst")) == want
    }
  }

  test("coarsen emits cross-cluster edges with exact multiplicities") {
    run("coarsen", 1305L) { edges =>
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val assign = verts.map(v => (v, v % 3))
      val rows = Prep.coarsen(edges.toDF("src", "dst"), assign.toDF("id", "cluster"))
        .as[(Long, Long, Long)].collect()
      val got = rows.map { case (a, b, c) => (a, b) -> c }.toMap
      val want = edges.map { case (u, v) => (u % 3, v % 3) }
        .filter(e => e._1 != e._2)
        .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      rows.length == got.size && got == want
    }
  }

  test("removeStandAloneVertices keeps exactly the incident ids") {
    run("removeStandAlone", 1306L) { edges =>
      val verts = (0L to edges.flatMap(e => Seq(e._1, e._2)).max + 2)
      val rows = Prep.removeStandAloneVertices(
          verts.toDF("id"), edges.toDF("src", "dst"))
        .as[Long].collect()
      val want = edges.flatMap(e => Seq(e._1, e._2)).toSet
      rows.length == rows.distinct.length && rows.toSet == want
    }
  }
}
