package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the forward-backward-coloring SCC
  * (extends the round-12 property program past the two verdict-listed
  * kernels): ScalaCheck-random DIRECTED multigraphs — self loops,
  * parallel edges, disconnected pieces, tangles of nested cycles —
  * against a textbook in-memory Kosaraju sharing no code with the
  * DataFrame operator. The FB-coloring outer loop (forward max-id
  * fixpoint, backward root sweep, peel) must produce exactly the
  * partition Kosaraju does, labeled by each component's max vertex id,
  * for every random shape. Reference analog: the reference's 4-phase
  * SCC state machine is exercised only by its hand-built example test
  * (EX/scc/SccComputationTestInMemory.java); this is that class of
  * check with the graph shape randomized. */
class SccPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Textbook Kosaraju: order by first-pass finish time, then sweep the
    * transpose; iterative DFS so deep tangles can't blow the stack. */
  private def kosarajuRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val fwd = edges.distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val rev = edges.distinct.map(_.swap).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val seen = mutable.Set.empty[Long]
    val order = mutable.ArrayBuffer.empty[Long]
    verts.foreach { s =>
      if (!seen.contains(s)) {
        val stack = mutable.Stack((s, false))
        while (stack.nonEmpty) {
          val (v, expanded) = stack.pop()
          if (expanded) order += v
          else if (!seen.contains(v)) {
            seen += v
            stack.push((v, true))
            fwd.getOrElse(v, Nil).foreach(w =>
              if (!seen.contains(w)) stack.push((w, false)))
          }
        }
      }
    }
    val comp = mutable.Map.empty[Long, Long]
    order.reverseIterator.foreach { s =>
      if (!comp.contains(s)) {
        val members = mutable.ArrayBuffer.empty[Long]
        val stack = mutable.Stack(s)
        comp(s) = s // provisional; relabel to max id below
        while (stack.nonEmpty) {
          val v = stack.pop()
          members += v
          rev.getOrElse(v, Nil).foreach { w =>
            if (!comp.contains(w)) { comp(w) = s; stack.push(w) }
          }
        }
        val label = members.max
        members.foreach(comp(_) = label)
      }
    }
    comp.toMap
  }

  test("scc equals in-memory Kosaraju on random directed multigraphs") {
    val gen = for {
      n <- Gen.choose(4, 24)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val got = Algos.scc(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val want = kosarajuRef(edges)
      if (got != want) {
        System.err.println(s"MISMATCH edges=$edges\n got=$got\n want=$want")
      }
      got == want
    }
    val r = SCTest.check(
      propParams(1214L, 8),
      prop)
    assert(r.passed, s"scc vs in-memory Kosaraju: ${r.status}")
  }
}
