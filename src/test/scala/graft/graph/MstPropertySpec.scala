package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the Borůvka MSF: ScalaCheck-random
  * weighted graphs (duplicate weights included — the (w, u, v) total
  * order makes the forest unique anyway, which is exactly the claim
  * under test) against an in-memory Kruskal over the same order,
  * sharing no code with the DataFrame operator. The existing parity
  * spec replays one fixture; this randomizes the shape, the weight
  * ties, and the component structure (disconnected pieces → a forest,
  * not a tree). */
class MstPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Kruskal under the (w, u, v) total order with union-find. */
  private def kruskalRef(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = mutable.Set.empty[(Long, Long, Long)]
    edges.sortBy(e => (e._3, e._1, e._2)).foreach { case (u, v, w) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; out += ((u, v, w)) }
    }
    out.toSet
  }

  test("mst equals Kruskal under the (w,u,v) order on random weighted graphs") {
    val gen = for {
      n <- Gen.choose(4, 22)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L)
        b <- Gen.choose(0L, n - 1L)
        w <- Gen.choose(1L, 8L) // small range on purpose: exercise ties
      } yield (a, b, w))
    } yield edges
    val prop = Prop.forAll(gen) { raw =>
      // canonical simple weighted graph (u < v, one weight per pair:
      // min — the operator's input contract of canonical pairs)
      val pairs = raw.collect { case (a, b, w) if a != b =>
        (math.min(a, b), math.max(a, b)) -> w
      }.groupBy(_._1).map { case ((u, v), o) => (u, v, o.map(_._2).min) }.toSeq
      if (pairs.isEmpty) true
      else {
        val got = Algos.mst(pairs.toDF("u", "v", "w"))
          .as[(Long, Long, Long)].collect().toSet
        val want = kruskalRef(pairs)
        if (got != want) {
          System.err.println(s"MISMATCH pairs=$pairs\n got=$got\n want=$want")
        }
        got == want
      }
    }
    val r = SCTest.check(
      propParams(1220L, 8),
      prop)
    assert(r.passed, s"mst vs in-memory Kruskal: ${r.status}")
  }
}
