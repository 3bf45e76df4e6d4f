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
    * for scheduled wide runs.
    *
    * `tag` names the CALL SITE for multi-test specs: the seed draw is
    * per call, so without it two tests in one class print two seeds
    * under the same class name and the replay line is ambiguous about
    * which test it applies to (round-13 advice). */
  def propParams(pinnedSeed: Long, minSuccessful: Int,
                 tag: String = ""): org.scalacheck.Test.Parameters =
    SparkSpec.propParams(pinnedSeed, minSuccessful,
      getClass.getName + (if (tag.isEmpty) "" else s"#$tag"))

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
      case Some(v) =>
        val parsed = try v.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"SPARK_GRAFT_PROP_SEED='$v' is not valid: pass 'random' or a " +
              "signed 64-bit decimal seed (the value a previous run printed)")
        }
        (parsed, "env")
      case None => (pinnedSeed, "pinned")
    }
    if (src != "pinned")
      System.err.println(
        s"[propParams] $who: seed=$seed ($src) — replay with SPARK_GRAFT_PROP_SEED=$seed")
    val mult = sys.env.get("SPARK_GRAFT_PROP_MIN_MULT").map { v =>
      try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"SPARK_GRAFT_PROP_MIN_MULT='$v' is not valid: pass a positive " +
            "decimal case-count multiplier")
      }
    }.getOrElse(1)
    org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(minSuccessful * mult)
      .withInitialSeed(org.scalacheck.rng.Seed(seed))
  }

  /** Double-family oracle tolerance: `default` is the reassociation-proof
    * bound (round-13: 1e-8 survives a future Kahan/AQE re-aggregation on
    * either side), but it also lets a 1e-9-class systematic drift pass
    * silently. `SPARK_GRAFT_PROP_STRICT=1` reasserts the seed-validated
    * tighter bound — meaningful ONLY on pinned-seed runs, where the exact
    * graphs that validated `strict` are the graphs replayed (round-13
    * advice: a slow-drift canary, not a universal claim). */
  def doubleTol(default: Double, strict: Double): Double =
    if (sys.env.contains("SPARK_GRAFT_PROP_STRICT")) strict else default

  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
