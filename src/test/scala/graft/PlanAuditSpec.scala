package graft

/** Plan-shape audits for the round-6 operators: each test pins the one
  * property that makes the operator scale — a broadcast that must not
  * degrade to a shuffle join, a fan-out that must stay inside the row,
  * a window that must run on a reduced frame. These assert on the
  * PHYSICAL plan, so an optimizer or stats regression that silently
  * reintroduces a scale-killer fails CI instead of surviving until a
  * 100× corpus finds it.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Queries.all(name)(spark, sf).queryExecution.executedPlan.toString

  test("benford: the 9-row law table joins as a broadcast, never a shuffle join") {
    val p = plan("q_benford")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("embedding covariance: the d² fan-out never becomes a corpus self-join") {
    val p = plan("q_emb_covariance")
    // the pair generation is two chained generators inside the row; the
    // only joins are broadcasts of the d-row sums and the 1-row count
    assert(!p.contains("SortMergeJoin"), p.take(800))
    assert(p.contains("Generate"), p.take(800))
  }

  test("trailing DAU: dedup happens before the window fan-out") {
    val p = plan("q_trailing_dau")
    // the 7x explode must read from an aggregated (user, day) frame, so
    // a Generate appears ABOVE at least one aggregate in the plan text
    val genIdx = p.indexOf("Generate explode")
    assert(genIdx >= 0, p.take(800))
    assert(p.indexOf("HashAggregate", genIdx) >= 0,
      "no aggregate below the explode:\n" + p.take(1200))
  }

  test("decay score: the reference day is a broadcast scalar") {
    val p = plan("q_decay_score")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("hourly heatmap plan has no join at all") {
    val p = plan("q_hourly_heatmap")
    assert(!p.contains("Join"), p.take(800))
  }

  test("vocab coverage ranks the TYPE frame, not the token stream") {
    val p = plan("q_vocab_coverage")
    // the global rank window must sit above the token-frequency aggregate
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0, p.take(800))
    assert(p.indexOf("HashAggregate", winIdx) >= 0,
      "window not above an aggregate:\n" + p.take(1200))
  }
}
