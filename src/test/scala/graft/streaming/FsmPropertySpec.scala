package graft.streaming

import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams._

/** Adversarial property checks of the keyed-state FSMs through the
  * public TestGroupState harness — no streaming query, pure state
  * logic, so hundreds of random cases run in milliseconds.
  *
  * The load-bearing property is BATCH-SPLIT INVARIANCE: the streaming
  * contract (Funnel/Sessionize scaladoc) is that with micro-batches
  * arriving in event-time order the result equals the batch query for
  * ANY batch boundaries — a real associativity claim about the state
  * encoding that the fixture-based parity specs exercise at exactly one
  * split point. Random event sequences with random cut points must
  * produce identical hits and identical final state as the same
  * sequence in one batch; an independent closed-form oracle (gap count
  * for sessions, the greedy three-stage scan for the funnel) pins the
  * absolute semantics on top. */
class FsmPropertySpec extends AnyFunSuite {

  private def mkEvents(raw: Seq[(Int, Long)]): Seq[Event] =
    raw.zipWithIndex.map { case ((ty, ts), i) =>
      Event(i.toLong, new Timestamp(ts),
        user_id = 7L,
        event_type = ty match {
          case 0 => "signup"; case 1 => "click"; case 2 => "purchase"
          case _ => "view"
        },
        value = 1.0)
    }.sortBy(e => (e.ts.getTime, e.event_id))

  /** Split a sorted sequence at the generated cut mask. */
  private def split[A](xs: Seq[A], cuts: Seq[Boolean]): Seq[Seq[A]] = {
    val out = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[A])
    xs.zipWithIndex.foreach { case (x, i) =>
      if (i > 0 && cuts(i % cuts.size)) out += scala.collection.mutable.ArrayBuffer.empty[A]
      out.last += x
    }
    out.map(_.toSeq).toSeq.filter(_.nonEmpty)
  }

  private def feedFunnel(batches: Seq[Seq[Event]]): (Seq[FunnelHit], Option[FunnelState]) = {
    var st: Option[FunnelState] = None
    val hits = batches.flatMap { b =>
      val gs = TestGroupState.create[FunnelState](
        st.map(Optional.of[FunnelState]).getOrElse(Optional.empty[FunnelState]()),
        GroupStateTimeout.NoTimeout, 1000L, Optional.empty[Long](), false)
      val out = Funnel.updateState(7L, b.iterator, gs).toSeq
      st = if (gs.exists) Some(gs.get) else None
      out
    }
    (hits, st)
  }

  private def feedSessions(batches: Seq[Seq[Event]]): (UserSessions, Option[SessionState]) = {
    var st: Option[SessionState] = None
    var last: UserSessions = null
    batches.foreach { b =>
      val gs = TestGroupState.create[SessionState](
        st.map(Optional.of[SessionState]).getOrElse(Optional.empty[SessionState]()),
        GroupStateTimeout.NoTimeout, 1000L, Optional.empty[Long](), false)
      last = Sessionize.updateState(7L, b.iterator, gs)
      st = if (gs.exists) Some(gs.get) else None
    }
    (last, st)
  }

  private val gen = for {
    n <- Gen.choose(1, 24)
    raw <- Gen.listOfN(n, for {
      ty <- Gen.choose(0, 3)
      ts <- Gen.choose(0L, 6000000L) // 100 min span vs the 30-min gap
    } yield (ty, ts))
    cuts <- Gen.listOfN(8, Gen.oneOf(true, false))
  } yield (mkEvents(raw), if (cuts.exists(identity)) cuts else List(true))

  test("funnel FSM is batch-split invariant and matches the greedy scan") {
    val prop = Prop.forAll(gen) { case (events, cuts) =>
      val (multiHits, multiSt) = feedFunnel(split(events, cuts))
      val (oneHits, oneSt) = feedFunnel(Seq(events))
      // independent greedy oracle over the globally sorted sequence
      var (s, c, p) = (Long.MinValue, Long.MinValue, Long.MinValue)
      events.foreach { e =>
        val t = e.ts.getTime
        if (e.event_type == "signup" && s == Long.MinValue) s = t
        else if (e.event_type == "click" && s != Long.MinValue &&
          c == Long.MinValue && t >= s) c = t
        else if (e.event_type == "purchase" && c != Long.MinValue &&
          p == Long.MinValue && t >= c) p = t
      }
      val wantHits =
        if (p != Long.MinValue) Seq(FunnelHit(7L, s, c, p)) else Seq.empty
      val ok = multiHits == oneHits && multiHits == wantHits && multiSt == oneSt
      if (!ok) System.err.println(
        s"MISMATCH events=$events cuts=$cuts\n multi=$multiHits one=$oneHits " +
          s"want=$wantHits\n stMulti=$multiSt stOne=$oneSt")
      ok
    }
    val r = SCTest.check(
      graft.SparkSpec.propParams(1240L, 200, getClass.getName + "#funnel"),
      prop)
    assert(r.passed, s"funnel FSM: ${r.status}")
  }

  test("sessionization FSM is batch-split invariant and matches the gap count") {
    val prop = Prop.forAll(gen) { case (events, cuts) =>
      val (multi, multiSt) = feedSessions(split(events, cuts))
      val (one, oneSt) = feedSessions(Seq(events))
      // independent oracle: sessions = 1 + #(sorted inter-event gaps > 30 min)
      val ts = events.map(_.ts.getTime * 1000000L)
      val wantSessions = 1L + ts.sliding(2).count {
        case Seq(a, b) => b - a > Sessionize.GapNs
        case _ => false
      }
      val want = UserSessions(7L, wantSessions, events.size.toLong)
      val ok = multi == one && multi == want && multiSt == oneSt
      if (!ok) System.err.println(
        s"MISMATCH events=$events cuts=$cuts\n multi=$multi one=$one want=$want")
      ok
    }
    val r = SCTest.check(
      graft.SparkSpec.propParams(1241L, 200, getClass.getName + "#sessionize"),
      prop)
    assert(r.passed, s"sessionization FSM: ${r.status}")
  }
}
