package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the bipartite butterfly (2×2 biclique)
  * census: random bipartite multigraphs (duplicates exercise the
  * distinct; skewed left degrees exercise the wedge-side pivot) against
  * brute-force enumeration of all (l₁<l₂, r₁<r₂) quadruples with all
  * four edges present. Wedge count and the two side cardinalities are
  * checked too — the full one-row census. */
class ButterflyPropertySpec extends SparkSpec {
  import spark.implicits._

  private def butterflyRef(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val e = edges.distinct
    val ls = e.map(_._1).distinct.sorted
    val rs = e.map(_._2).distinct.sorted
    val set = e.toSet
    val wedges = e.groupBy(_._1).values.map { es =>
      val d = es.size.toLong; d * (d - 1) / 2
    }.sum
    var bf = 0L
    for {
      i <- ls.indices; j <- (i + 1) until ls.size
      p <- rs.indices; q <- (p + 1) until rs.size
      if set((ls(i), rs(p))) && set((ls(i), rs(q))) &&
         set((ls(j), rs(p))) && set((ls(j), rs(q)))
    } bf += 1
    (ls.size.toLong, rs.size.toLong, wedges, bf)
  }

  test("butterflyCount equals brute-force biclique enumeration") {
    val gen = for {
      nl <- Gen.choose(2, 10)
      nr <- Gen.choose(2, 10)
      m <- Gen.choose(nl, 3 * (nl + nr))
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, nl - 1L), Gen.choose(100L, 99L + nr)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val rows = Algos.butterflyCount(edges.toDF("l", "r"))
        .as[(Long, Long, Long, Long)].collect()
      val want = butterflyRef(edges)
      val ok = rows.length == 1 && rows.head == want
      if (!ok) {
        System.err.println(s"MISMATCH edges=$edges\n got=${rows.toSeq}\n want=$want")
      }
      ok
    }
    val r = SCTest.check(
      propParams(1224L, 10),
      prop)
    assert(r.passed, s"butterflyCount vs brute force: ${r.status}")
  }
}
