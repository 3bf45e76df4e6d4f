package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial invariant check of the mutual-proposal maximal matching:
  * on ScalaCheck-random graphs the output must be (1) a subset of the
  * input edges, (2) a MATCHING — no vertex in two pairs, and (3)
  * MAXIMAL — every input edge has at least one matched endpoint. Unlike
  * the peeler/Brandes properties this is invariant- not
  * equality-shaped: maximal matchings are not unique, so the spec pins
  * what every correct output must satisfy on every shape (the
  * deterministic md5-priority fixpoint is separately oracle-unrolled in
  * the driver correctness gate). */
class MatchingPropertySpec extends SparkSpec {
  import spark.implicits._

  test("maximalMatching output is a maximal matching on random graphs") {
    val gen = for {
      n <- Gen.choose(4, 30)
      m <- Gen.choose(n / 2, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { raw =>
      val pairs = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b))
      }.distinct
      if (pairs.isEmpty) true
      else {
        val sym = pairs.flatMap(p => Seq(p, p.swap))
        val got = Algos.maximalMatching(sym.toDF("src", "dst"))
          .as[(Long, Long)].collect().toSeq
        val edgeSet = pairs.toSet
        val isSubset = got.forall(edgeSet.contains)
        val ends = got.flatMap(p => Seq(p._1, p._2))
        val isMatching = ends.distinct.size == ends.size
        val matched = ends.toSet
        val isMaximal = pairs.forall(p => matched(p._1) || matched(p._2))
        if (!(isSubset && isMatching && isMaximal)) {
          System.err.println(s"VIOLATION pairs=$pairs got=$got " +
            s"subset=$isSubset matching=$isMatching maximal=$isMaximal")
        }
        isSubset && isMatching && isMaximal
      }
    }
    val r = SCTest.check(
      propParams(1222L, 10),
      prop)
    assert(r.passed, s"maximalMatching invariants: ${r.status}")
  }
}
