package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.graph.{Algos, Prep}
import graft.io.GraphFormats
import graft.pipeline.Corpus

/** CLI entry point — the Spark-native analog of `GiraphRunner`
  * (giraph-core .../GiraphRunner.java:69-94; quick-start invocation
  * `hadoop jar … GiraphRunner <Computation> -vif … -vip … -op … -w N`,
  * src/site/xdoc/quick_start.xml:215). spark-submit-able:
  *
  *   spark-submit --class graft.cli.GraftRunner graft.jar \
  *     <algo> --edges <path> --format parquet|edgelist|adjacency|json \
  *     --out <path> [--source N] [--iters N] [--symmetric] [--parallelism N]
  *
  * Graph algos (--edges): pagerank | wpagerank | sssp | bfs | wcc | scc |
  * degrees | mis | triangles. Corpus pipeline ops (--docs, a parquet of
  * (doc_id, text[, source])): dedup-exact | dedup-minhash | dedup-clusters |
  * tfidf | vocab | scrub | pack | sample | repetition. Output is written
  * as parquet (default) — pair with GraphFormats writers for text sinks.
  */
object GraftRunner {

  private val PipelineAlgos = Set("dedup-exact", "dedup-minhash", "dedup-clusters",
    "tfidf", "vocab", "scrub", "pack", "sample", "sample-topk", "repetition",
    "dedup-index-write", "dedup-index-probe", "dedup-cdc", "surprisal",
    "bpe-train", "jaccard-join", "bm25", "textrank", "eval-ranking", "winnow",
    "vad")

  def main(args: Array[String]): Unit = {
    if (args.length < 1) { usage(); sys.exit(2) }
    val algo = args(0)
    val opts = parseFlags(args.drop(1).toList, Map.empty)
    val inputKey =
      if (algo == "query") "sf" // table directory, not a single file
      else if (PipelineAlgos(algo)) "docs"
      else if (opts.contains("gen")) "gen" // synthetic input, no path needed
      else "edges"
    val required = (Seq(inputKey, "out") ++
      (if (algo == "dedup-index-probe") Seq("index") else Nil) ++
      (if (algo == "run-class") Seq("class") else Nil))
      .filterNot(opts.contains)
    if (required.nonEmpty) {
      System.err.println(s"missing: ${required.map("--" + _).mkString(" ")}"); usage(); sys.exit(2)
    }

    val builder = SparkSession.builder()
      .appName(s"graft-$algo")
      .config("spark.sql.shuffle.partitions",
        opts.getOrElse("parallelism", "32"))
    // local default for dev; spark-submit's --master wins when set (and
    // keeps Spark's heartbeat defaults — on a cluster it IS liveness)
    val spark = (if (sys.env.contains("SPARK_MASTER")) builder
      else graft.LocalLiveness.widen(
        builder.master(s"local[${opts.getOrElse("parallelism", "*")}]"))).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      // null result ⇒ the action wrote its own output layout (index write)
      val result = execute(spark, algo, opts)
      if (result != null) result.write.mode("overwrite").parquet(opts("out"))
      println(s"[graft] $algo done -> ${opts("out")}")
    } finally spark.stop()
  }

  /** Resolve and run one CLI action on an existing session — separated
    * from [[main]] (which owns session lifecycle + the output write) so
    * in-process callers and specs can drive the exact CLI dispatch
    * without a private session being created and stopped under them. */
  def execute(spark: SparkSession, algo: String, opts: Map[String, String]): DataFrame =
        // generic runner: any declared query by name over a table
        // directory — the spark-submit path to the full 250+ query
        // surface (the GiraphRunner arbitrary-computation analog for
        // the relational/pipeline side)
        if (algo == "query") {
          val name = opts.getOrElse("name",
            { System.err.println("query requires --name <q_...>"); usage(); sys.exit(2); "" })
          graft.SparkEntry.queries.get(name) match {
            case Some(fn) => fn(spark, opts("sf"))
            case None =>
              System.err.println(s"unknown query: $name (see SparkEntry.queries)")
              sys.exit(2); null
          }
        } else if (PipelineAlgos(algo)) {
          val docs = spark.read.parquet(opts("docs"))
          val budget = opts.getOrElse("budget", "2048").toLong
          algo match {
            case "dedup-exact"    => Dedup.exactClusters(docs)
            case "dedup-minhash"  => Dedup.minhashDupPairs(docs)
            case "dedup-clusters" => Dedup.dupClusters(
              Dedup.minhashDupPairs(docs).select(col("a"), col("b")))
            case "tfidf"          => Corpus.tfIdfTopK(docs, opts.getOrElse("k", "5").toInt)
            case "vocab"          => Corpus.vocabulary(docs, opts.getOrElse("k", "10000").toInt)
            case "scrub"          => Corpus.piiScrub(docs)
            case "pack"           => Corpus.greedyPack(docs, budget).toDF()
            case "sample"         => Corpus.stratifiedSample(docs)
            case "sample-topk"    => Corpus.sampleExactK(docs, opts.getOrElse("k", "1000").toInt)
            case "repetition"     => Corpus.repetitionStats(docs)
            case "dedup-index-write" =>
              // sign the standing corpus once; probe increments later.
              // writes its own layout (buckets/ + shingles/) — the
              // generic result write below must not clobber it
              Dedup.writeSignatureIndex(docs, opts("out"))
              null
            case "dedup-index-probe" =>
              Dedup.incrementalDupPairs(docs, opts("index"))
            case "jaccard-join" => graft.dedup.Dedup.jaccardJoin(
              docs.select(col("doc_id"),
                graft.text.TextFunctions.shingleSet(col("text"), 8).as("items")),
              thresholdPct = opts.getOrElse("t", "80").toInt)
            case "bm25" => graft.pipeline.Retrieval.bm25(docs,
              opts.getOrElse("terms", "spark,vector,merge").split(",").toSeq,
              k = opts.getOrElse("k", "15").toInt)
            case "textrank" => graft.pipeline.Retrieval.textRank(docs,
              vocab = opts.getOrElse("vocab", "150").toInt,
              iters = opts.getOrElse("iters", "10").toInt,
              topK = opts.getOrElse("k", "25").toInt)
            case "eval-ranking" => graft.pipeline.Retrieval.evalRanking(docs,
              opts.getOrElse("terms", "spark,vector,merge").split(",").toSeq,
              k = opts.getOrElse("k", "10").toInt)
            case "dedup-cdc" =>
              Dedup.cdcDupPairs(docs,
                threshold = opts.getOrElse("threshold", "0.5").toDouble)
            case "surprisal" => Corpus.surprisalScore(docs)
            case "bpe-train" =>
              Corpus.bpeTrain(docs, opts.getOrElse("k", "1000").toInt)
            case "winnow" => graft.SignalQueries.winnowPanel(docs)
            case "vad"    => graft.SignalQueries.vadPanel(docs)
          }
        } else {
          var edges =
            if (opts.contains("gen")) genEdges(spark, opts)
            else readEdges(spark, opts.getOrElse("format", "parquet"), opts("edges"))
          if (opts.contains("symmetric")) edges = Prep.makeSymmetric(edges)
          if (algo == "wpagerank" && !edges.columns.contains("w"))
            edges = edges.withColumn("w", lit(1L))
          val iters = opts.getOrElse("iters", "10").toInt
          val source = opts.get("source").map(_.toLong)
          algo match {
            case "pagerank"  => Algos.pagerank(edges, iters)
            case "pagerank-conv" => Algos.pagerankConverged(edges,
              maxIters = iters,
              tol = opts.getOrElse("tol", "1e-8").toDouble,
              convergence = opts.getOrElse("convergence", "sum"))._1
            case "wpagerank" => Algos.pagerankWeighted(edges, iters)
            case "sssp"      => Algos.sssp(edges, source.getOrElse(minSrc(edges)))
            case "bfs"       => Algos.bfs(edges, Seq(source.getOrElse(minSrc(edges))))
            case "wcc"       => Algos.wcc(edges)
            case "scc"       => Algos.scc(edges)
            case "degrees"   => Algos.degrees(edges)
            case "mis"       => Algos.independentSet(edges)
            case "triangles" =>
              Algos.triangleCount(edges.filter(col("src") < col("dst"))
                .select(col("src").as("u"), col("dst").as("v")).distinct())
            case "ktruss" =>
              Algos.kTruss(edges.filter(col("src") < col("dst"))
                  .select(col("src").as("u"), col("dst").as("v")).distinct(),
                k = opts.getOrElse("k", "4").toInt)
            case "lpa"   => Algos.lpa(edges, rounds = iters)
            // ecc/neighborhood symmetrize INTERNALLY since round 11 (the
            // two-frontier anti-join is only sound when |dist(u)−dist(v)|
            // ≤ 1 across an edge — the guard lives in taggedBfs /
            // neighborhoodFunction now, not at call sites). The default
            // source is the min VERTEX (endpoint of either orientation),
            // so it no longer depends on the input's edge direction.
            case "ecc"   => Algos.eccentricities(edges,
              source.map(Seq(_)).getOrElse(Seq(minVertex(edges))))
            case "walks" => Algos.randomWalks(edges, len = opts.getOrElse("len", "4").toInt)
            case "mst" =>
              val we = if (edges.columns.contains("w")) edges
                else edges.withColumn("w", lit(1L))
              Algos.mst(we.filter(col("src") < col("dst"))
                .select(col("src").as("u"), col("dst").as("v"), col("w")))
            case "katz" => Algos.katz(edges, rounds = iters)
            case "salsa" => Algos.salsa(edges, iterations = iters)
            case "squares" => graft.SignalQueries.squareCensus(
              edges.filter(col("src") < col("dst"))
                .select(col("src").as("u"), col("dst").as("v")).distinct())
            case "bowtie" => Algos.bowtie(edges)
            case "coloring" => Algos.greedyColoring(edges)
            case "matching" => Algos.maximalMatching(edges)
            case "diameter" => Algos.doubleSweep(edges)
            case "richclub" => Algos.richClub(
              edges.filter(col("src") < col("dst"))
                .select(col("src").as("u"), col("dst").as("v")).distinct(),
              opts.getOrElse("ks", "1,2,4,8,16,32").split(",").toSeq.map(_.toLong))
            case "bridges" => Algos.localBridgeStats(
              edges.filter(col("src") < col("dst"))
                .select(col("src").as("u"), col("dst").as("v")).distinct())
            case "degree-matrix" => Algos.jointDegreeMatrix(
              edges.filter(col("src") < col("dst"))
                .select(col("src").as("u"), col("dst").as("v")).distinct())
            case "peel" => Algos.leafPeelCounts(edges,
              rounds = opts.getOrElse("rounds", "6").toInt)
            case "neighborhood" => Algos.neighborhoodFunction(edges,
              maxH = opts.getOrElse("maxh", "4").toInt,
              sampleMod = opts.getOrElse("samplemod", "37").toLong)
            case "anf-sketch" => Algos.anfSketch(edges,
              maxH = opts.getOrElse("maxh", "4").toInt)
            case "linkpred" =>
              Algos.linkPredict(
                edges.filter(col("src") < col("dst"))
                  .select(col("src").as("u"), col("dst").as("v")).distinct(),
                maxMidDeg = opts.getOrElse("maxdeg", "500").toLong)
            // Messaging / aggregator stress drivers (reference
            // RandomMessageBenchmark / AggregatorsBenchmark analogs)
            case "bench-messages" => graft.graph.BenchDrivers.randomMessages(
              edges, supersteps = iters,
              msgsPerVertex = opts.getOrElse("msgs", "3").toInt,
              payloadBytes = opts.getOrElse("bytes", "64").toInt)
            case "bench-aggregators" => graft.graph.BenchDrivers.aggregatorStress(
              edges, supersteps = iters,
              nAggs = opts.getOrElse("naggs", "16").toInt)
            // Arbitrary user computation — the GiraphRunner `-Computation
            // <class>` analog (GiraphRunner.java:69-94): reflectively load
            // a graft.UserProgram from the job classpath (spark-submit
            // --jars) and drive it through the shared Pregel loop.
            case "run-class" =>
              val prog = Class.forName(opts("class"))
                .getDeclaredConstructor().newInstance()
                .asInstanceOf[graft.UserProgram]
              graft.graph.Pregel.run(
                prog.init(spark, edges, opts), edges,
                prog.sendMsg, prog.combineMsg, prog.vprog,
                graft.graph.PregelOptions(maxSupersteps =
                  opts.get("iters").map(_.toInt).getOrElse(prog.maxSupersteps)))
            case other => System.err.println(s"unknown algo: $other"); usage(); sys.exit(2); null
          }
        }

  private def minSrc(edges: DataFrame): Long =
    edges.agg(min(col("src"))).first().getLong(0)

  /** Min vertex id over BOTH endpoints — the orientation-independent
    * default source for the undirected algorithms (ecc symmetrizes
    * internally, so a vertex appearing only as a destination is a valid
    * source and the default must not change with the input's edge
    * direction — round-11 advice fix). */
  private def minVertex(edges: DataFrame): Long =
    edges.agg(least(min(col("src")), min(col("dst")))).first().getLong(0)

  private def readEdges(spark: SparkSession, format: String, path: String): DataFrame =
    format match {
      case "parquet"   => spark.read.parquet(path)
      case "edgelist"  => GraphFormats.readEdgeList(spark, path)
      case "adjacency" => GraphFormats.readAdjacencyList(spark, path)._2
      case "json"      => GraphFormats.readJsonVertexLines(spark, path)._2
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }

  /** Synthetic benchmark inputs — the reference's PseudoRandom /
    * WattsStrogatz input formats with PageRankBenchmark's knobs
    * (giraph-core .../benchmark/PageRankBenchmark.java:47-91: `-V`
    * aggregate vertices, `-e` edges per vertex; WattsStrogatz `BETA`). */
  private def genEdges(spark: SparkSession, opts: Map[String, String]): DataFrame = {
    val n = opts.getOrElse("vertices", "100000").toLong
    val d = opts.getOrElse("degree", "8").toInt
    val seed = opts.getOrElse("seed", "42").toLong
    opts("gen") match {
      case "uniform" => graft.io.Generators.uniform(spark, n, d, seed,
        localRatioPermille = opts.getOrElse("local-ratio", "0").toInt)
      case "ws" => graft.io.Generators.wattsStrogatz(spark, n, d,
        betaPermille = opts.getOrElse("beta", "100").toInt, seed = seed)
      case other => throw new IllegalArgumentException(s"unknown generator: $other")
    }
  }

  @annotation.tailrec
  private def parseFlags(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case "--symmetric" :: rest => parseFlags(rest, acc + ("symmetric" -> "true"))
      case flag :: value :: rest if flag.startsWith("--") =>
        parseFlags(rest, acc + (flag.stripPrefix("--") -> value))
      case other :: _ =>
        throw new IllegalArgumentException(s"unexpected argument: $other")
    }

  private def usage(): Unit = System.err.println(
    """usage: GraftRunner <algo> --edges <path> --out <path>
      |  [--format parquet|edgelist|adjacency|json] [--source N]
      |  [--iters N] [--symmetric] [--parallelism N]
      |  or --gen uniform|ws --vertices N --degree N [--seed N]
      |     [--local-ratio permille] [--beta permille]   (benchmark inputs)
      |  graph algo: pagerank pagerank-conv wpagerank sssp bfs wcc scc
      |              degrees mis triangles ktruss [--k N] lpa ecc
      |              walks [--len N] mst katz salsa squares
      |              linkpred [--maxdeg N] bowtie
      |              richclub [--ks a,b,..] bridges degree-matrix
      |              peel [--rounds N] diameter coloring matching
      |              ([--tol X] [--convergence
      |              sum|max|sum_rel|max_rel|rmse] for pagerank-conv)
      |              run-class --class <fqcn of a graft.UserProgram>
      |              (user computation from the job classpath)
      |              bench-messages [--msgs N] [--bytes N] (msg stress)
      |              bench-aggregators [--naggs N] (aggregator stress)
      |or: GraftRunner query --name <q_...> --sf <table-dir> --out <path>
      |  (runs any declared SparkEntry query over a testdata-layout dir)
      |or: GraftRunner <op> --docs <parquet> --out <path> [--k N] [--budget N]
      |  corpus op: dedup-exact dedup-minhash dedup-clusters tfidf vocab
      |             scrub pack sample sample-topk repetition winnow vad
      |             dedup-cdc [--threshold X] surprisal bpe-train [--k N]
      |             textrank [--vocab N] [--iters N] [--k N]
      |             eval-ranking [--terms a,b] [--k N]
      |             dedup-index-write (signs --docs into --out)
      |             dedup-index-probe --index <path> (probe increment)""".stripMargin)
}
