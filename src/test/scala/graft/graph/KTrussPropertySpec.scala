package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the distributed k-truss peeler
  * (round-12 verdict task 4): ScalaCheck-random simple graphs against a
  * direct in-memory fixpoint peeler sharing no code with the DataFrame
  * operator — the oriented-intersection support count, the
  * stale-support exit rule (a pass that drops nothing over the CURRENT
  * edge set), and the final within-truss support annotation all have to
  * agree exactly, for every random shape and several k. Reference
  * analog: the reference's hand-computed example tests
  * (EX/.../SimpleTriangleClosingComputationTest.java) exercise the
  * triangle machinery the same way, minus the randomization. */
class KTrussPropertySpec extends SparkSpec {
  import spark.implicits._

  /** In-memory truss fixpoint: recompute support over the surviving
    * set, drop edges under k−2, repeat; returns the final edges with
    * their within-truss support. */
  private def trussRef(edges: Set[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    def support(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = es.toSeq.flatMap(p => Seq(p, p.swap))
        .groupBy(_._1).map { case (a, v) => a -> v.map(_._2).toSet }
      es.map { case (u, v) =>
        (u, v) -> (adj(u) & adj(v)).size.toLong
      }.toMap
    }
    var e = edges
    var done = false
    while (!done) {
      val sup = support(e)
      val kept = sup.filter(_._2 >= k - 2).keySet
      done = kept == e
      e = kept
    }
    support(e)
  }

  test("kTruss equals the in-memory fixpoint peeler on random graphs") {
    val gen = for {
      n <- Gen.choose(5, 18)
      m <- Gen.choose(n, 4 * n)
      k <- Gen.choose(3, 5)
      raw <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield (raw, k)
    val prop = Prop.forAll(gen) { case (raw, k) =>
      // canonicalize: u < v, dedup, no self loops (the operator's input
      // contract — every in-repo producer emits canonical pairs)
      val pairs = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b))
      }.distinct
      if (pairs.isEmpty) true
      else {
        val got = Algos.kTruss(pairs.toDF("u", "v"), k)
          .as[(Long, Long, Long)].collect()
          .map { case (u, v, s) => (u, v) -> s }.toMap
        val want = trussRef(pairs.toSet, k)
        if (got != want) {
          System.err.println(s"MISMATCH k=$k pairs=$pairs\n got=$got\n want=$want")
        }
        got == want
      }
    }
    val r = SCTest.check(
      propParams(1212L, 8),
      prop)
    assert(r.passed, s"kTruss vs in-memory peeler: ${r.status}")
  }
}
