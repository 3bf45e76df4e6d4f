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

  test("EWMA fold runs without any join — pure agg + per-type array fold") {
    val p = plan("q_ewma_daily")
    assert(!p.contains("Join"), p.take(800))
  }

  test("winnowing is per-row array work — no join anywhere") {
    val p = plan("q_text_winnow")
    assert(!p.contains("Join"), p.take(800))
  }

  test("CUPED moments reach the variants as broadcasts, never a shuffle join") {
    val p = plan("q_cuped")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("square and K4 censuses never degrade to a cartesian product") {
    assert(!plan("q_graph_squares").contains("CartesianProduct"))
    assert(!plan("q_graph_k4").contains("CartesianProduct"))
  }

  test("q18 prunes via the aggregate semi-filter BEFORE the wide join") {
    val p = plan("q18_large")
    // the Σqty > 150 filter must appear as an aggregate below the first
    // join with orders — i.e. the big-orders frame is reduced first
    val joinIdx = p.indexOf("Join")
    assert(joinIdx >= 0, p.take(800))
    assert(p.indexOf("HashAggregate", joinIdx) >= 0, p.take(1200))
  }

  test("fanout sampling counts with map-side partial aggregation") {
    // the sampled h1 frame is checkpointed (its per-vertex rank window
    // runs inside the checkpoint action), so the final plan is the
    // 2-hop join + count: assert it partial-aggregates before the
    // exchange and never degrades to a cartesian product
    val p = plan("q_graph_sample_fanout")
    assert(p.contains("partial_count"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }
}
