package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** ScalaCheck parameters shared by every property spec.
    *
    * Default is the spec's pinned seed: CI stays reproducible, and a
    * recorded pass is a statement about specific, replayable graphs.
    * Exploration mode widens coverage on demand (ADVICE r12 — a pinned
    * seed with ~10 cases exercises the same graphs forever):
    * `SPARK_GRAFT_PROP_SEED=random` draws a fresh seed per suite object
    * and prints it so any failure is replayable by exporting the printed
    * value; `SPARK_GRAFT_PROP_SEED=<long>` replays exactly that seed.
    * `SPARK_GRAFT_PROP_MIN_MULT=<k>` multiplies each spec's case count
    * for scheduled wide runs. */
  def propParams(pinnedSeed: Long, minSuccessful: Int): org.scalacheck.Test.Parameters =
    SparkSpec.propParams(pinnedSeed, minSuccessful, getClass.getName)

  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }
}

object SparkSpec {
  /** Shared implementation behind the trait's propParams; specs that
    * don't need a Spark session (e.g. FsmPropertySpec) call it here. */
  def propParams(pinnedSeed: Long, minSuccessful: Int,
                 who: String): org.scalacheck.Test.Parameters = {
    val (seed, src) = sys.env.get("SPARK_GRAFT_PROP_SEED") match {
      case Some("random") => (scala.util.Random.nextLong(), "random")
      case Some(v)        => (v.toLong, "env")
      case None           => (pinnedSeed, "pinned")
    }
    if (src != "pinned")
      System.err.println(
        s"[propParams] $who: seed=$seed ($src) — replay with SPARK_GRAFT_PROP_SEED=$seed")
    val mult = sys.env.get("SPARK_GRAFT_PROP_MIN_MULT").map(_.toInt).getOrElse(1)
    org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(minSuccessful * mult)
      .withInitialSeed(org.scalacheck.rng.Seed(seed))
  }

  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
