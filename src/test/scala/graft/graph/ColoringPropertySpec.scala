package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the Jones–Plassmann greedy coloring:
  * ScalaCheck-random undirected graphs against the SEQUENTIAL greedy
  * coloring in descending (priority, id) order, computed in memory with
  * an independently-implemented md5 priority. JP's fixpoint IS that
  * sequential order — a vertex wins a round exactly when all its
  * higher-priority neighbors are colored (a lower-priority neighbor can
  * never color first, since the vertex itself blocks it as an uncolored
  * higher-priority neighbor), at which point its colored neighborhood
  * equals its higher-priority neighborhood — so the oracle is EXACT
  * per-vertex color equality, strictly stronger than the proper-coloring
  * + ≤Δ+1 invariants it implies. The in-memory priority replicates
  * `conv(substring(md5(id), 1, 15), 16, 10)` via MessageDigest, sharing
  * no Spark code. Self-loops are excluded: a self-looped vertex admits
  * no proper color (the operator parks it uncolored at maxRounds). */
class ColoringPropertySpec extends SparkSpec {
  import spark.implicits._

  /** First 15 hex chars of md5(id decimal string) as a long — the same
    * 60-bit value the operator derives with Spark's md5/conv/substring. */
  private def prio(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Sequential greedy mex coloring in descending (prio, id) order. */
  private def greedyRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val color = mutable.Map.empty[Long, Long]
    verts.sortBy(v => (prio(v), v)).reverse.foreach { v =>
      val used = adj(v).flatMap(color.get)
      var c = 0L
      while (used.contains(c)) c += 1
      color(v) = c
    }
    color.toMap
  }

  test("greedyColoring equals sequential greedy in priority order") {
    val gen = for {
      n <- Gen.choose(4, 32)
      m <- Gen.choose(n / 2, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges.filter(e => e._1 != e._2)
    val prop = Prop.forAll(gen) { edges =>
      val sym = edges.flatMap(e => Seq(e, e.swap))
      val got =
        if (sym.isEmpty) Map.empty[Long, Long]
        else Algos.greedyColoring(sym.toDF("src", "dst"))
          .as[(Long, Long)].collect().toMap
      val want = greedyRef(edges)
      if (got != want) {
        System.err.println(s"MISMATCH edges=$edges\n got=$got\n want=$want")
      }
      got == want
    }
    val r = SCTest.check(
      propParams(1220L, 8),
      prop)
    assert(r.passed, s"greedyColoring vs sequential greedy: ${r.status}")
  }
}
