package graft.graph

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized crash-resume property for the Pregel checkpoint machinery
  * (round-13 verdict task 4): random graph, random checkpoint cadence,
  * random kill superstep — the resumed run must equal the uninterrupted
  * run BIT-EXACTLY, for both the message-driven [[Pregel.run]] and the
  * fixed-iteration [[Pregel.iterate]]. This is the one invariant the
  * reference's entire checkpoint/restart apparatus reduces to
  * (BspServiceMaster.java:1190-1223 getLastGoodCheckpoint →
  * restartFromCheckpoint): a worker death at ANY superstep, under ANY
  * snapshot cadence, is invisible in the final answer. The fixed
  * PregelSpec fixture pins one (cadence=1, kill=1) point; this spec
  * walks the lattice, including kills BEFORE the first snapshot lands
  * (resume then legitimately restarts from scratch) and kills AFTER
  * convergence (the hook never fires and the "killed" run completes). */
class PregelResumePropertySpec extends SparkSpec {
  import spark.implicits._

  private def graphGen = for {
    n <- Gen.choose(3, 10)
    m <- Gen.choose(n, 2 * n)
    edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    cadence <- Gen.choose(1, 3)
    kill <- Gen.choose(0, 3)
  } yield (edges.map(e => if (e._1 == e._2) (e._1, (e._2 + 1) % n) else e),
    cadence, kill)

  /** Max-id propagation via the message API: converges in ≤ diameter
    * supersteps, value trace is integral (bit-exact comparison). */
  private def maxPropRun(edges: Seq[(Long, Long)], opts: PregelOptions): Seq[(Long, Long)] = {
    val sym = edges.flatMap(e => Seq(e, e.swap)).toDF("src", "dst")
    val verts = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("v"), lit(true).as("active"))
    val out = Pregel.run(
      verts, sym,
      sendMsg = j => j.select(col("dst").as("id"), col("v").as("msg")),
      combineMsg = max(col("msg")),
      vprog = (vs, msgs) => vs.join(msgs, Seq("id"), "left").select(
        col("id"),
        greatest(col("v"), coalesce(col("msg"), col("v"))).as("v"),
        (coalesce(col("msg"), col("v")) > col("v")).as("active")),
      opts = opts)
    out.select("id", "v").as[(Long, Long)].collect().toSeq.sorted
  }

  /** Fixed 4 rounds of min-label spread via the iterate API. */
  private def minIterate(edges: Seq[(Long, Long)], opts: PregelOptions): Seq[(Long, Long)] = {
    val sym = edges.flatMap(e => Seq(e, e.swap)).toDF("src", "dst").localCheckpoint()
    val verts = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    val out = Pregel.iterate(verts, iterations = 4, opts) { (vs, _) =>
      val inc = sym.join(vs.select(col("id").as("src"), col("lbl")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min(col("lbl")).as("nl"))
      vs.join(inc, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
    }
    out.select("id", "lbl").as[(Long, Long)].collect().toSeq.sorted
  }

  private def killAt(step: Int): (DataFrame, Int) => Unit =
    (_, i) => if (i == step) sys.error(s"simulated worker death at $step")

  private def crashResume(runner: PregelOptions => Seq[(Long, Long)],
                          cadence: Int, kill: Int): Boolean = {
    val dir = Files.createTempDirectory("graft-resume-prop").toString
    val golden = runner(PregelOptions(maxSupersteps = 32))
    val died = try {
      val completed = runner(PregelOptions(maxSupersteps = 32,
        checkpointEvery = cadence, checkpointDir = Some(dir),
        onSuperstep = killAt(kill)))
      // converged before the kill step: nothing to resume, but the
      // checkpointed run must already agree
      if (completed != golden) return false
      false
    } catch { case e: RuntimeException if e.getMessage.contains("simulated") => true }
    val resumed = runner(PregelOptions(maxSupersteps = 32,
      checkpointEvery = cadence, checkpointDir = Some(dir), resume = true))
    val ok = resumed == golden
    if (!ok)
      System.err.println(s"MISMATCH cadence=$cadence kill=$kill died=$died\n golden=$golden\n resumed=$resumed")
    ok
  }

  test("run: resumed crash equals uninterrupted run bit-exactly") {
    val prop = Prop.forAll(graphGen) { case (edges, cadence, kill) =>
      crashResume(maxPropRun(edges, _), cadence, kill)
    }
    val r = SCTest.check(propParams(1408L, 6, tag = "run"), prop)
    assert(r.passed, s"Pregel.run crash-resume: ${r.status}")
  }

  test("iterate: resumed crash equals uninterrupted run bit-exactly") {
    val prop = Prop.forAll(graphGen) { case (edges, cadence, kill) =>
      crashResume(minIterate(edges, _), cadence, kill)
    }
    val r = SCTest.check(propParams(1409L, 6, tag = "iterate"), prop)
    assert(r.passed, s"Pregel.iterate crash-resume: ${r.status}")
  }
}
