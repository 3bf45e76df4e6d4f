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

  test("vector sum aggregator sums elementwise") {
    val got = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDS()
      .select(new Reducers.VectorSum(2).toColumn).first()
    assert(got == Seq(4.0, 6.0))
  }
}
