package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of AND-model deadlock detection: a vertex
  * is deadlocked iff some dependency chain from it reaches a cycle.
  * ScalaCheck-random directed multigraphs (self loops — each a 1-cycle
  * — parallel edges, nested tangles) against an in-memory reference
  * that finds cycle vertices by iterative DFS back-edge detection and
  * closes them under forward reachability — a different decomposition
  * from the operator's scc → cyclic core → reversed-edge
  * delta-frontier sweep, so agreement checks both halves. */
class DeadlockPropertySpec extends SparkSpec {
  import spark.implicits._

  /** In-memory: cyclic = vertices on any directed cycle (self loops
    * included); deadlocked = vertices that can reach a cyclic vertex. */
  private def deadlockRef(edges: Seq[(Long, Long)]): Map[Long, Int] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val fwd = edges.distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    // vertex is on a cycle iff it can reach itself in ≥ 1 step
    def reaches(from: Long, target: Long): Boolean = {
      val seen = mutable.Set.empty[Long]
      val stack = mutable.Stack(fwd.getOrElse(from, Nil): _*)
      while (stack.nonEmpty) {
        val v = stack.pop()
        if (v == target) return true
        if (!seen.contains(v)) { seen += v; stack.pushAll(fwd.getOrElse(v, Nil)) }
      }
      false
    }
    val cyclic = verts.filter(v => reaches(v, v)).toSet
    verts.map { v =>
      v -> (if (cyclic(v) || cyclic.exists(c => reaches(v, c))) 1 else 0)
    }.toMap
  }

  test("deadlock equals in-memory reach-a-cycle on random directed multigraphs") {
    val gen = for {
      n <- Gen.choose(4, 22)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val got = Algos.deadlock(edges.toDF("src", "dst"))
        .as[(Long, Int)].collect().toMap
      val want = deadlockRef(edges)
      if (got != want) {
        System.err.println(s"MISMATCH edges=$edges\n got=$got\n want=$want")
      }
      got == want
    }
    val r = SCTest.check(
      propParams(1224L, 8),
      prop)
    assert(r.passed, s"deadlock vs in-memory reach-a-cycle: ${r.status}")
  }
}
