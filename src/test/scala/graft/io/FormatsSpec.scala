package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("json vertex lines parse the reference SSSP fixture") {
    // FIXTURES.md §A1 == JsonLongDoubleFloatDoubleVertexInputFormat doc
    val lines = Seq(
      "[1,0,[[2,1],[3,3]]]",
      "[2,0,[[3,1],[4,10]]]",
      "[3,0,[[4,2]]]",
      "[4,0,[]]").toDF("line")
    val (v, e) = GraphFormats.parseJsonVertexLines(lines)
    assert(v.count() == 4)
    val edges = e.orderBy("src", "dst").as[(Long, Long, Double)].collect().toSeq
    assert(edges == Seq((1L, 2L, 1.0), (1L, 3L, 3.0), (2L, 3L, 1.0), (2L, 4L, 10.0), (3L, 4L, 2.0)))
  }

  test("adjacency list round-trips through write + read") {
    val dir = tmp("adj")
    val v = Seq((1L, 0.1), (2L, 0.2)).toDF("id", "value")
    val e = Seq((1L, 2L, 0.5), (2L, 1L, 0.25)).toDF("src", "dst", "w")
    GraphFormats.writeAdjacencyList(v, e, dir)
    val (v2, e2) = GraphFormats.readAdjacencyList(spark, dir)
    assert(v2.orderBy("id").as[(Long, Double)].collect().toSeq == Seq((1L, 0.1), (2L, 0.2)))
    assert(e2.orderBy("src").as[(Long, Long, Double)].collect().toSeq ==
      Seq((1L, 2L, 0.5), (2L, 1L, 0.25)))
  }

  test("edge list reads src/dst[/w] and reverse duplication doubles rows") {
    val dir = tmp("edges")
    Files.write(java.nio.file.Paths.get(dir, "e.txt"), "1\t2\n2\t3\n".getBytes)
    val e = GraphFormats.readEdgeList(spark, dir)
    assert(e.count() == 2)
    assert(GraphFormats.withReverseEdges(e).count() == 4)
  }

  test("idWithValue writes sorted id<TAB>value lines") {
    val dir = tmp("idv")
    GraphFormats.writeIdWithValue(Seq((2L, 7.0), (1L, 5.0)).toDF("id", "value"), dir)
    val lines = spark.read.text(dir).as[String].collect().toSeq
    assert(lines == Seq("1\t5.0", "2\t7.0"))
  }

  test("jsonBase64 round-trips vertices and weighted edges byte-exactly") {
    val dir = tmp("jb64")
    // negative and fractional values exercise the sign bit of the IEEE
    // pattern and the unsigned-hex wraparound in the decoder
    val v = Seq((1L, 0.5), (2L, -3.25), (3L, 0.0)).toDF("id", "value")
    val e = Seq((1L, 2L, 1.5), (1L, 3L, -2.0), (2L, 3L, 7.0)).toDF("src", "dst", "w")
    GraphFormats.writeJsonBase64(v, e, dir)
    val (rv, re) = GraphFormats.readJsonBase64(spark, dir)
    assert(rv.orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 0.5), (2L, -3.25), (3L, 0.0)))
    assert(re.orderBy("src", "dst").as[(Long, Long, Double)].collect().toSeq ==
      Seq((1L, 2L, 1.5), (1L, 3L, -2.0), (2L, 3L, 7.0)))
    // wire-byte check: LongWritable(1) is 8 big-endian bytes = AAAAAAAAAAE=
    val line = spark.read.text(dir).as[String].collect().sorted.head
    assert(line.contains("\"vertexId\":\"AAAAAAAAAAE=\""))
  }

  test("typed id-neighbors and id-value text formats parse") {
    val dir = tmp("iin")
    Files.write(java.nio.file.Paths.get(dir, "g.txt"), "1 2 3\n2 3\n3\n".getBytes)
    val (v, e) = GraphFormats.readIdNeighborsText(spark, dir)
    assert(v.orderBy("id").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    assert(e.orderBy("src", "dst").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val dir2 = tmp("iiv")
    Files.write(java.nio.file.Paths.get(dir2, "g.txt"), "1\t10\n2 20\n".getBytes)
    assert(GraphFormats.readIdValueText(spark, dir2).orderBy("id")
      .as[(Long, Long)].collect().toSeq == Seq((1L, 10L), (2L, 20L)))
  }

  test("generators are deterministic and have exact out-degree") {
    val g1 = Generators.uniform(spark, 100, 3, seed = 7)
    val g2 = Generators.uniform(spark, 100, 3, seed = 7)
    assert(g1.count() == 300)
    assert(g1.exceptAll(g2).count() == 0)
    assert(g1.filter(col("src") === col("dst")).count() == 0)
    val ws = Generators.wattsStrogatz(spark, 50, 2, betaPermille = 200, seed = 7)
    assert(ws.count() == 100)
    assert(ws.exceptAll(Generators.wattsStrogatz(spark, 50, 2, 200, 7)).count() == 0)
  }

  test("bucketed edge tables self-join on the bucket key without a shuffle") {
    val dir = tmp("bucketed")
    val e = spark.range(1, 1001).select(col("id").as("src"),
      pmod(col("id") * 7, lit(1000L)).as("dst"))
    GraphFormats.writeBucketedEdges(e, "fs_bucketed_e", s"$dir/e", buckets = 4)
    try {
      val t = spark.table("fs_bucketed_e")
      val joined = t.as("a").join(t.as("b"), "src")
      joined.count()
      // both sides carry the bucket hash partitioning — the executed join
      // plan must contain no shuffle exchange
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
      val agg = t.groupBy(col("src")).agg(count(lit(1)))
      agg.count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally spark.sql("DROP TABLE IF EXISTS fs_bucketed_e")
  }

  test("uniform generator honors LOCAL_EDGES_MIN_RATIO") {
    val g = Generators.uniform(spark, 1000, 8, seed = 7,
      localRatioPermille = 800, numPartitions = 10)
    assert(g.count() == 8000) // out-degree exactly d
    assert(g.filter(col("src") === col("dst")).count() == 0)
    // range partition p(v) = v·P/n — locality fraction ≥ the knob
    val frac = g.select(
        (expr("src * 10 div 1000") === expr("dst * 10 div 1000")).cast("double").as("loc"))
      .agg(avg(col("loc"))).first().getDouble(0)
    assert(frac >= 0.8, s"local fraction $frac < 0.8")
    // deterministic
    assert(g.exceptAll(Generators.uniform(spark, 1000, 8, 7, 800, 10)).count() == 0)
    // degenerate shapes: size-1 range partitions (P == n) and P > n must
    // still give exact out-degree, no self-loops, and no null dst
    val tiny = Generators.uniform(spark, 5, 3, seed = 7,
      localRatioPermille = 1000, numPartitions = 32)
    assert(tiny.count() == 15)
    assert(tiny.filter(col("dst").isNull || col("src") === col("dst")).count() == 0)
    assert(tiny.filter(col("dst") < 0 || col("dst") >= 5).count() == 0)
  }

  test("partitioned store: one file per partition, pruned read, row parity") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"t${i % 3}", (i % 4).toLong, i * 10L))
      .toDF("id", "typ", "day", "v")
    val path = java.nio.file.Files.createTempDirectory("graft_pstore")
    try {
      PartitionedStore.write(df, path.toString, Seq("typ", "day"))
      // one data file per (typ, day) partition — the small-file discipline
      val files = java.nio.file.Files.walk(path).iterator()
      val parquets = scala.jdk.CollectionConverters.IteratorHasAsScala(files)
        .asScala.filter(_.toString.endsWith(".parquet")).toSeq
      assert(parquets.size == 12, s"expected 12 files, got ${parquets.size}")
      // pruned read: partition predicate must reach PartitionFilters
      val back = PartitionedStore.read(spark, path.toString)
        .filter(col("typ") === "t1" && col("day") === 2L)
      val plan = back.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(typ"),
        "no partition filter in scan:\n" + plan.take(600))
      // row parity against the in-memory frame
      val got = back.select(col("id"), col("v")).as[(Long, Long)].collect().toSet
      val exp = df.filter(col("typ") === "t1" && col("day") === 2L)
        .select(col("id"), col("v")).as[(Long, Long)].collect().toSet
      assert(got == exp && got.nonEmpty)

      // fragment one partition with three extra appends, then compact it
      val extra = Seq((900L, "t1", 2L, 9000L), (901L, "t1", 2L, 9010L),
        (902L, "t1", 2L, 9020L)).toDF("id", "typ", "day", "v")
      extra.repartition(3).write.mode("append")
        .partitionBy("typ", "day").parquet(path.toString)
      def filesIn(sub: String) = {
        val d = path.resolve(sub)
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          java.nio.file.Files.walk(d).iterator()).asScala
          .count(_.toString.endsWith(".parquet"))
      }
      assert(filesIn("typ=t1/day=2") == 4) // 1 original + 3 appended
      PartitionedStore.compact(spark, path.toString, Seq("typ", "day"),
        col("typ") === "t1" && col("day") === 2L)
      assert(filesIn("typ=t1/day=2") == 1)
      // untouched partition keeps its single file; rows survive compaction
      assert(filesIn("typ=t0/day=0") == 1)
      val after = PartitionedStore.read(spark, path.toString)
        .filter(col("typ") === "t1" && col("day") === 2L).count()
      assert(after == exp.size + 3)

      // retention: drop day=3 partitions by directory delete, no scan
      val dropped = PartitionedStore.dropPartitions(path.toString,
        kvs => kvs.get("day").forall(_ != "3"))
      assert(dropped == 3) // one day=3 leaf per typ
      val remaining = PartitionedStore.read(spark, path.toString)
      assert(remaining.filter(col("day") === 3L).count() == 0)
      assert(remaining.count() == 100 + 3 - df.filter(col("day") === 3L).count())
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
