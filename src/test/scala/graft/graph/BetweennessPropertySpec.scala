package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the level-synchronous sampled Brandes
  * (round-12 verdict task 4): the fixed-corpus oracle replays one graph
  * shape; this throws ScalaCheck-random DIRECTED multigraphs (self
  * loops, parallel edges, disconnected pieces) at [[Algos.betweenness]]
  * and demands numerical agreement with a textbook in-memory Brandes
  * (Brandes 2001, Alg. 1) over the symmetrized simple graph — an
  * implementation sharing no code with the DataFrame one. The internal
  * symmetrize guard must make edge orientation irrelevant, the σ
  * accumulation must survive parallel-edge dedup, and the backward δ
  * recurrence must agree to floating-point noise regardless of Spark's
  * aggregation order. Reference analog: the reference's hand-computed
  * example tests (EX/.../SimpleShortestPathsComputationTest.java:139-201)
  * are this class, minus the randomization. */
class BetweennessPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Textbook Brandes over an undirected simple graph, summed over the
    * given source set (sources accumulate no δ from their own tree, but
    * may from other sources' trees — the same convention as the
    * DataFrame operator's level ≥ 1 backward slices). */
  private def brandesRef(adj: Map[Long, Seq[Long]],
                         sources: Seq[Long]): Map[Long, Double] = {
    val bc = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    sources.foreach { s =>
      val stack = mutable.Stack.empty[Long]
      val pred = mutable.Map.empty[Long, mutable.ListBuffer[Long]]
      val sigma = mutable.Map.empty[Long, Long].withDefaultValue(0L)
      val dist = mutable.Map.empty[Long, Long]
      sigma(s) = 1L; dist(s) = 0L
      val q = mutable.Queue(s)
      while (q.nonEmpty) {
        val v = q.dequeue()
        stack.push(v)
        adj.getOrElse(v, Nil).foreach { w =>
          if (!dist.contains(w)) { dist(w) = dist(v) + 1; q.enqueue(w) }
          if (dist(w) == dist(v) + 1) {
            sigma(w) += sigma(v)
            pred.getOrElseUpdate(w, mutable.ListBuffer.empty) += v
          }
        }
      }
      val delta = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      while (stack.nonEmpty) {
        val w = stack.pop()
        pred.getOrElse(w, Nil).foreach { v =>
          delta(v) += (sigma(v).toDouble / sigma(w).toDouble) * (1.0 + delta(w))
        }
        if (w != s && delta(w) > 0.0) bc(w) += delta(w)
      }
    }
    bc.toMap.filter(_._2 > 0.0)
  }

  test("betweenness equals in-memory Brandes on random directed multigraphs") {
    val gen = for {
      n <- Gen.choose(5, 28)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val sources = verts.take(3)
      // ours: raw DIRECTED edges — the internal symmetrize guard makes
      // the result the undirected bc regardless of orientation
      val got = Algos.betweenness(edges.toDF("src", "dst"), sources)
        .as[(Long, Double)].collect().toMap
      // theirs: textbook Brandes over the symmetrized simple graph
      // (self-loops never satisfy the level+1 rule in either engine)
      val sym = edges.flatMap(e => Seq(e, e.swap)).distinct
        .filter(e => e._1 != e._2)
      val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val want = brandesRef(adj, sources)
      val keysOk = got.keySet == want.keySet
      val valsOk = keysOk && want.forall { case (id, w) =>
        math.abs(got(id) - w) <= 1e-9 * math.max(1.0, math.abs(w))
      }
      if (!(keysOk && valsOk)) {
        System.err.println(s"MISMATCH edges=$sym sources=$sources\n got=$got\n want=$want")
      }
      keysOk && valsOk
    }
    val r = SCTest.check(
      propParams(1207L, 8),
      prop)
    assert(r.passed, s"betweenness vs in-memory Brandes: ${r.status}")
  }
}
