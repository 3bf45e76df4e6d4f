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
}
