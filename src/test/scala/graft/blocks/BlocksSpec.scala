package graft.blocks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Reducers

class BlocksSpec extends SparkSpec {
  import spark.implicits._

  test("sequence/repeat/filtering compose as expected") {
    val df = Seq(1L, 2L, 3L, 4L).toDF("id").withColumn("v", col("id"))
    val inc: Blocks.Step = Blocks.forAllVertices("v", col("v") + 1)
    val prog = Blocks.sequence(
      Blocks.repeat(3)(inc),
      Blocks.filtering(col("id") % 2 === 0)(inc))
    val got = prog(df).orderBy("id").select("v").as[Long].collect().toSeq
    assert(got == Seq(4L, 6L, 6L, 8L))
  }

  test("repeatUntil stops on the halt predicate") {
    val df = Seq(0L).toDF("v")
    val inc: Blocks.Step = _.withColumn("v", col("v") + 1)
    val out = Blocks.repeatUntil(100)(inc)(d => d.first().getLong(0) >= 5)(df)
    assert(out.first().getLong(0) == 5L)
  }

  test("reducers: product, xor, pair-max aggregate correctly") {
    val prod = Seq(2.0, 3.0, -4.0).toDF("x")
      .agg(Reducers.productCol(col("x"))).first().getDouble(0)
    assert(math.abs(prod - (-24.0)) < 1e-9)
    val zeroProd = Seq(2.0, 0.0).toDF("x")
      .agg(Reducers.productCol(col("x"))).first().getDouble(0)
    assert(zeroProd == 0.0)
    val xor = Seq(5L, 3L, 6L).toDS().select(Reducers.LongXor.toColumn).first()
    assert(xor == (5L ^ 3L ^ 6L))
    val pair = Seq((1L, 2.0), (2L, 9.0), (3L, 9.0)).toDS()
      .select(Reducers.MaxPair.toColumn).first()
    assert(pair == ((2L, 9.0)))
  }

  test("topN reducer keeps the N largest across partitions, descending") {
    val got = spark.range(0, 100).repartition(7)
      .select(col("id")).as[Long]
      .select(new Reducers.TopNLong(5).toColumn).first()
    assert(got == Seq(99L, 98L, 97L, 96L, 95L))
    // fewer elements than capacity → all of them
    val small = Seq(3L, 9L, 1L).toDS()
      .select(new Reducers.TopNLong(5).toColumn).first()
    assert(small == Seq(9L, 3L, 1L))
  }

  test("vector sum aggregator sums elementwise") {
    val got = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDS()
      .select(new Reducers.VectorSum(2).toColumn).first()
    assert(got == Seq(4.0, 6.0))
  }

  test("sparse vector sum merges disjoint and overlapping indices") {
    // overlapping (index 2) + disjoint (0, 5, 9) entries across inputs
    val got = Seq(Map(0 -> 1.0, 2 -> 2.0), Map(2 -> 3.0, 5 -> 4.0),
      Map(9 -> 0.5), Map.empty[Int, Double]).toDS()
      .select(new Reducers.SparseVectorSum[Double].toColumn).first()
    assert(got == Map(0 -> 1.0, 2 -> 5.0, 5 -> 4.0, 9 -> 0.5))
    // integral variant (LongSparseVectorSumAggregator analog)
    val longs = Seq(Map(1 -> 10L), Map(1 -> 5L, 7 -> 1L)).toDS()
      .select(new Reducers.SparseVectorSum[Long].toColumn).first()
    assert(longs == Map(1 -> 15L, 7 -> 1L))
  }

  test("sparse matrix sum merges row-wise") {
    val got = Seq(
      Map(0 -> Map(0 -> 1.0, 3 -> 2.0)),            // row 0
      Map(0 -> Map(3 -> 1.0), 4 -> Map(1 -> 7.0)),  // overlaps row 0, new row 4
      Map(4 -> Map(1 -> 1.0, 2 -> 2.0))).toDS()
      .select(new Reducers.SparseMatrixSum[Double].toColumn).first()
    assert(got == Map(
      0 -> Map(0 -> 1.0, 3 -> 3.0),
      4 -> Map(1 -> 8.0, 2 -> 2.0)))
  }

  test("sendMessageChain expresses SSSP and matches the golden fixture") {
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 3L), (2L, 3L, 1L), (2L, 4L, 10L), (3L, 4L, 2L))
      .toDF("src", "dst", "w")
    // one relaxation superstep in chain form: send dist+w to neighbors,
    // combine with min, consume by keeping the smaller of dist and msg
    val relax = Blocks.startSendToNeighbors(edges,
        msg = col("dist") + col("w"), combine = min(col("m")))
      .endConsume((verts, msgs) =>
        verts.join(msgs, Seq("id"), "left")
          .select(col("id"), least(col("dist"), col("msg")).as("dist")))
    val init = Seq((1L, Some(0L)), (2L, None), (3L, None), (4L, None))
      .toDF("id", "dist")
    val got = Blocks.repeat(4)(relax)(init)
      .filter(col("dist").isNotNull).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 4L)))
  }

  test("sendMessageChain threads the combined value into the next link") {
    // two-hop degree: link 1 sends 1 (combined = in-degree), link 2
    // forwards the received in-degree, combined = sum over senders
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L).toDF("id")
    val step = Blocks.startSendToNeighbors(edges, lit(1L), sum(col("m")))
      .thenSendToNeighbors(col("msg"), sum(col("m")))
      .endConsume((vs, msgs) => vs.join(msgs, Seq("id"), "left"))
    val got = step(verts).orderBy("id")
      .as[(Long, Option[Long])].collect().toSeq
    // 4 receives 2's in-degree (2); everyone else receives nothing
    assert(got == Seq((1L, None), (2L, None), (3L, None), (4L, Some(2L))))
  }

  test("sparse vector sum by explode matches the aggregator") {
    val df = Seq(Map(0 -> 1.0, 2 -> 2.0), Map(2 -> 3.0, 5 -> 4.0)).toDF("m")
    val got = Reducers.sparseVectorSumByExplode(df, "m")
      .orderBy("index").as[(Int, Double)].collect().toSeq
    assert(got == Seq((0, 1.0), (2, 5.0), (5, 4.0)))
  }
}
