package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of time-respecting reachability: random
  * temporal multigraphs against an in-memory replay of the earliest-
  * arrival recurrence arr(v) = min over in-edges (u,v,t), t ≥ arr(u),
  * of t. The monotone min-combine makes the fixed-round prefix exact
  * (the q_graph_temporal oracle unrolls the same rounds in SQL on one
  * fixture); random shapes exercise what the fixture can't — stale
  * edges that must NOT forward newer arrivals, ties between parallel
  * edges at different times, cycles that re-relax. All exact Longs. */
class TemporalReachPropertySpec extends SparkSpec {
  import spark.implicits._

  private def reachRef(edges: Seq[(Long, Long, Long)], source: Long,
                       rounds: Int): Map[Long, Long] = {
    var arr = Map(source -> 0L)
    for (_ <- 1 to rounds) {
      val cand = edges.flatMap { case (u, v, t) =>
        arr.get(u).filter(_ <= t).map(_ => v -> t)
      }
      arr = (arr.toSeq ++ cand).groupBy(_._1)
        .map { case (v, xs) => v -> xs.map(_._2).min }
    }
    arr
  }

  test("temporalReach equals the in-memory earliest-arrival replay") {
    val gen = for {
      n <- Gen.choose(3, 25)
      m <- Gen.choose(n, 4 * n)
      edges <- Gen.listOfN(m, for {
        s <- Gen.choose(0L, n - 1L)
        d <- Gen.choose(0L, n - 1L)
        t <- Gen.choose(0L, 15L)
      } yield (s, d, t))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val source = edges.flatMap(e => Seq(e._1, e._2)).min
      val rows = Algos.temporalReach(edges.toDF("src", "dst", "t"), source, rounds = 6)
        .as[(Long, Long)].collect()
      val got = rows.toMap
      val want = reachRef(edges, source, rounds = 6)
      val ok = rows.length == got.size && got == want
      if (!ok) {
        System.err.println(
          s"MISMATCH source=$source edges=$edges\n got=$got\n want=$want")
      }
      ok
    }
    val r = SCTest.check(
      propParams(1227L, 10),
      prop)
    assert(r.passed, s"temporalReach vs in-memory replay: ${r.status}")
  }
}
