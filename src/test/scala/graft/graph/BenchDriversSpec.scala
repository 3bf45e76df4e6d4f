package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BenchDriversSpec extends SparkSpec {
  import spark.implicits._

  // 6-ring, symmetric: every vertex has degree 2
  private lazy val ring6 = {
    val f = (0L until 6L).map(i => (i, (i + 1) % 6))
    (f ++ f.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  test("randomMessages: deterministic per-superstep message accounting") {
    val out = BenchDrivers.randomMessages(ring6, supersteps = 3,
      msgsPerVertex = 1, payloadBytes = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // 6 vertices × 1 msg × 64 bytes every superstep
    assert(out === Seq((0, 6L, 384L), (1, 6L, 384L), (2, 6L, 384L)))
  }

  test("randomMessages: fan-out is capped by vertex degree") {
    val out = BenchDrivers.randomMessages(ring6, supersteps = 2,
      msgsPerVertex = 5, payloadBytes = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // degree 2 < 5 requested → 6 × 2 msgs, × 10 bytes
    assert(out === Seq((0, 12L, 120L), (1, 12L, 120L)))
  }

  test("randomMessages is rerun-deterministic") {
    val a = BenchDrivers.randomMessages(ring6, 2, 1, 8).collect().toSeq
    val b = BenchDrivers.randomMessages(ring6, 2, 1, 8).collect().toSeq
    assert(a === b)
  }

  test("aggregatorStress: N named aggregators evaluated every superstep") {
    val out = BenchDrivers.aggregatorStress(ring6, supersteps = 2, nAggs = 3)
    val rows = out.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // sum(id) over 0..5 = 15; agg_k multiplies by (k+1)
    val expect = for (s <- 0 to 1; k <- 0 to 2)
      yield (s, s"agg_$k", 15L * (k + 1))
    assert(rows === expect)
  }
}
