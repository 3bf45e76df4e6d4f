package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of weighted single-source shortest paths:
  * ScalaCheck-random DIRECTED multigraphs (parallel edges with different
  * weights, self loops, unreachable pieces) against an in-memory
  * Dijkstra sharing no code with the Pregel relaxation. The engine is
  * Bellman-Ford-flavored BSP (min-combiner relaxation), the oracle is a
  * binary-heap Dijkstra — two different algorithms that must agree
  * exactly on non-negative integer weights, including the "unreached
  * vertices are absent" contract. taggedBfs already has GraphX as a
  * randomized hop-count oracle (TaggedBfsPropertySpec); this covers the
  * WEIGHTED relaxation path the hop kernels never exercise. */
class SsspPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Textbook heap Dijkstra over directed adjacency with Long weights. */
  private def dijkstraRef(edges: Seq[(Long, Long, Long)],
                          source: Long): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(e => (e._2, e._3))
    }
    val dist = mutable.Map.empty[Long, Long]
    val pq = mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.by[(Long, Long), Long](_._1).reverse)
    dist(source) = 0L
    pq.enqueue((0L, source))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d == dist(u)) {
        adj.getOrElse(u, Nil).foreach { case (v, w) =>
          val nd = d + w
          if (!dist.contains(v) || nd < dist(v)) {
            dist(v) = nd
            pq.enqueue((nd, v))
          }
        }
      }
    }
    dist.toMap
  }

  test("sssp equals in-memory Dijkstra on random weighted digraphs") {
    val gen = for {
      n <- Gen.choose(4, 30)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, for {
        s <- Gen.choose(0L, n - 1L)
        d <- Gen.choose(0L, n - 1L)
        w <- Gen.choose(0L, 9L)
      } yield (s, d, w))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      // source = the min vertex id present (always exists; may reach
      // nothing — the absent-row contract is then the whole assertion)
      val source = edges.flatMap(e => Seq(e._1, e._2)).min
      val rows = Algos.sssp(edges.toDF("src", "dst", "w"), source)
        .as[(Long, Long)].collect()
      val got = rows.toMap
      val want = dijkstraRef(edges, source)
      val ok = rows.length == got.size && got == want
      if (!ok) {
        System.err.println(
          s"MISMATCH source=$source edges=$edges\n got=$got\n want=$want")
      }
      ok
    }
    val r = SCTest.check(
      propParams(1219L, 10),
      prop)
    assert(r.passed, s"sssp vs in-memory Dijkstra: ${r.status}")
  }
}
