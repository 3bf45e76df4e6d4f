package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the deterministic id-priority maximal
  * independent set: ScalaCheck-random undirected graphs against the
  * LEXICOGRAPHICALLY-FIRST MIS computed by an in-memory sequential
  * greedy sharing no code with the DataFrame operator. The id-priority
  * rule ("enter when smaller than every still-undecided neighbor")
  * converges to exactly the greedy-by-ascending-id set — a vertex
  * enters greedily iff no smaller neighbor entered — so the oracle is
  * EXACT equality, strictly stronger than the independence+maximality
  * invariants (which it implies). Reference analog: the reference's
  * DistributedIndependentSet is exercised only by its fixed example
  * test (BLOCK8 .../algo/DistributedIndependentSet.java:53-118); this
  * randomizes the graph shape. Self-loops are excluded by construction:
  * a self-looped vertex can be neither in nor out of an independent set
  * (the operator parks it undecided, the notion itself is undefined). */
class MisPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Lexicographically-first MIS: ascending id, enter iff no smaller
    * in-set neighbor. */
  private def lexFirstMis(edges: Seq[(Long, Long)]): Map[Long, Int] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val in = mutable.Set.empty[Long]
    verts.foreach { v =>
      if (!adj(v).exists(w => w < v && in.contains(w))) in += v
    }
    verts.map(v => v -> (if (in.contains(v)) 1 else 0)).toMap
  }

  test("independentSet equals the lex-first MIS on random graphs") {
    val gen = for {
      n <- Gen.choose(4, 40)
      m <- Gen.choose(n / 2, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges.filter(e => e._1 != e._2)
    val prop = Prop.forAll(gen) { edges =>
      val sym = edges.flatMap(e => Seq(e, e.swap))
      val got =
        if (sym.isEmpty) Map.empty[Long, Int]
        else Algos.independentSet(sym.toDF("src", "dst"))
          .as[(Long, Int)].collect().toMap
      val want = lexFirstMis(edges)
      if (got != want) {
        System.err.println(s"MISMATCH edges=$edges\n got=$got\n want=$want")
      }
      got == want
    }
    val r = SCTest.check(
      propParams(1219L, 10),
      prop)
    assert(r.passed, s"independentSet vs lex-first MIS: ${r.status}")
  }
}
