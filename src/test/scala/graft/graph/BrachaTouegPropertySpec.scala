package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the Bracha-Toueg OR-model deadlock
  * detector on random tagged wait-for graphs vs an in-memory fixpoint
  * of the published recurrence: notified = forward reachability from
  * the initiator; free₀ = notified sinks; then a vertex is freed when
  * ANY of its request tags has ALL targets free (AND within a tag, OR
  * across tags). The engine runs this as a delta-frontier counter
  * cascade with a peeled pure-requester one-shot — two optimizations
  * the oracle's naive set iteration is blind to, which is the point:
  * random tangles (multi-tag vertices, self-waits, frees crossing
  * un-notified regions, pure requesters depending on core frees) must
  * come out identical. AND-model deadlock has its own spec
  * (DeadlockPropertySpec); this is the OR side. */
class BrachaTouegPropertySpec extends SparkSpec {
  import spark.implicits._

  private def ref(edges: Seq[(Long, Long, Long)], initiator: Long,
                  rounds: Int): Map[Long, (Int, Int)] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.groupBy(_._1)
    // notified: BFS ≤ rounds hops from the initiator
    val notified = mutable.Set(initiator)
    var layer: Seq[Long] = Seq(initiator)
    var h = 0
    while (layer.nonEmpty && h < rounds) {
      layer = layer.flatMap(u => adj.getOrElse(u, Nil).map(_._2))
        .distinct.filterNot(notified.contains)
      layer.foreach(notified += _)
      h += 1
    }
    // grant fixpoint
    val srcs = adj.keySet
    val groups = edges.groupBy(e => (e._1, e._3))
      .map { case ((s, tag), es) => (s, tag, es.map(_._2).toSet) }
    val free = mutable.Set.empty[Long]
    verts.filter(v => notified(v) && !srcs(v)).foreach(free += _)
    for (_ <- 1 to rounds) {
      groups.foreach { case (s, _, targets) =>
        if (!free(s) && targets.subsetOf(free)) free += s
      }
    }
    verts.map(v =>
      v -> (if (notified(v)) 1 else 0, if (free(v)) 1 else 0)).toMap
  }

  test("brachaToueg OR-model equals the in-memory grant fixpoint") {
    val gen = for {
      n <- Gen.choose(3, 14)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, for {
        s <- Gen.choose(0L, n - 1L)
        d <- Gen.choose(0L, n - 1L)
        t <- Gen.choose(0L, 2L)
      } yield (s, d, t))
    } yield edges.distinct
    val prop = Prop.forAll(gen) { edges =>
      val initiator = edges.flatMap(e => Seq(e._1, e._2)).min
      val rows = Algos.brachaToueg(edges.toDF("src", "dst", "tag"), initiator)
        .as[(Long, Int, Int)].collect()
      val got = rows.map { case (v, n0, f0) => v -> (n0, f0) }.toMap
      val want = ref(edges, initiator, rounds = 20)
      val ok = rows.length == got.size && got == want
      if (!ok) {
        System.err.println(
          s"MISMATCH initiator=$initiator edges=$edges\n got=$got\n want=$want")
      }
      ok
    }
    val r = SCTest.check(
      propParams(1233L, 10),
      prop)
    assert(r.passed, s"brachaToueg vs in-memory fixpoint: ${r.status}")
  }
}
