package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the degree-oriented triangle count —
  * the intersection kernel every cohesion operator in the repo builds
  * on (clustering, transitivity, k-truss support, triads, null model).
  * ScalaCheck-random simple graphs against a brute-force in-memory
  * enumeration over vertex triples: the compact-forward orientation
  * (degree order with id tie-break) must count every triangle exactly
  * once on every shape, hubs and all. */
class TrianglePropertySpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: check all C(n,3) triples against the edge set. */
  private def triangleRef(pairs: Seq[(Long, Long)]): Long = {
    val es = pairs.toSet
    val verts = pairs.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    def has(a: Long, b: Long) = es((math.min(a, b), math.max(a, b)))
    var c = 0L
    for {
      i <- verts.indices
      j <- (i + 1) until verts.size
      if has(verts(i), verts(j))
      k <- (j + 1) until verts.size
      if has(verts(i), verts(k)) && has(verts(j), verts(k))
    } c += 1
    c
  }

  test("triangleCount equals brute-force enumeration on random graphs") {
    val gen = for {
      n <- Gen.choose(4, 24)
      m <- Gen.choose(n, 5 * n) // dense end on purpose: exercise hubs
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { raw =>
      val pairs = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b))
      }.distinct
      if (pairs.isEmpty) true
      else {
        val got = Algos.triangleCount(pairs.toDF("u", "v"))
          .as[Long].collect().head
        val want = triangleRef(pairs)
        if (got != want) {
          System.err.println(s"MISMATCH pairs=$pairs got=$got want=$want")
        }
        got == want
      }
    }
    val r = SCTest.check(
      propParams(1226L, 10),
      prop)
    assert(r.passed, s"triangleCount vs brute force: ${r.status}")
  }
}
