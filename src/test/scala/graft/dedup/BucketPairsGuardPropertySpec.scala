package graft.dedup

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized oracle for the hot-bucket star guard (round-13 verdict
  * task 3d): random banded corpora with PLANTED hot buckets — including
  * the adversarial mixed-bucket regime where several DISTINCT signature
  * groups collide in one bucket — checked guard-on vs guard-off.
  *
  * The preserved object is deliberately NOT the raw pair set: star
  * expansion exists to thin a hot bucket's O(B²) same-bucket pairs to
  * O(B) rep↔member stars, so guard-on candidates are a strict subset by
  * design. What must be IDENTICAL is what survives downstream: the
  * connected components of the VERIFIED pair graph (verification passes
  * exactly within a signature group — the model of exact near-dup
  * verification), which is what [[Dedup.dupClusters]] consumes. The
  * round-11 recall hole was exactly a violation of this invariant (a
  * second sig group in a mixed hot bucket lost its own star and its
  * cluster dissolved); the round-12 per-signature-group stars restored
  * it, and this property pins it on random shapes.
  *
  * Construction respects the pipeline's physics: a signature group's
  * members share the full signature, hence identical band hashes — a
  * group occupies the SAME bucket in every band, and collisions happen
  * between groups (small bv range forces them often). */
class BucketPairsGuardPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Components (as canonical min-id labeling) of the verified pair
    * graph: candidate pairs filtered to same-signature-group. */
  private def components(pairs: Seq[(Long, Long)],
                         group: Map[Long, Int]): Map[Long, Long] = {
    val verified = pairs.filter { case (a, b) => group(a) == group(b) }
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    verified.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // singletons are components too: every doc id appears
    group.keys.map(v => v -> find(v)).toMap
  }

  test("star guard preserves verified-pair components on planted hot buckets") {
    val gen = for {
      nGroups <- Gen.choose(1, 7)
      sizes <- Gen.listOfN(nGroups, Gen.frequency(
        3 -> Gen.choose(1, 3),   // cold groups
        2 -> Gen.choose(8, 16))) // hot groups (over the cap below)
      nBands <- Gen.choose(2, 4)
      // small bv range → frequent cross-group bucket collisions (the
      // mixed-bucket adversarial regime)
      bvs <- Gen.listOfN(nGroups, Gen.listOfN(nBands, Gen.choose(0, 2)))
    } yield (sizes, nBands, bvs)
    val prop = Prop.forAll(gen) { case (sizes, nBands, bvs) =>
      val group: Map[Long, Int] = sizes.zipWithIndex.flatMap { case (sz, g) =>
        Seq.fill(sz)(g)
      }.zipWithIndex.map { case (g, id) => id.toLong -> g }.toMap
      val banded = group.toSeq.flatMap { case (id, g) =>
        (0 until nBands).map(b => (id, g.toLong, b, bvs(g)(b).toLong))
      }.toDF("doc_id", "sigg", "band", "bv")
      def pairsAt(cap: Int): Seq[(Long, Long)] =
        Dedup.bucketPairs(banded, Seq("band", "bv"), "doc_id", cap)
          .as[(Long, Long)].collect().toSeq
      val off = pairsAt(Int.MaxValue)
      val on = pairsAt(4)
      val (cOff, cOn) = (components(off, group), components(on, group))
      val ok = cOff == cOn && on.size <= off.size
      if (!ok)
        System.err.println(s"MISMATCH sizes=$sizes bvs=$bvs\n off=${off.sorted}\n on=${on.sorted}\n cOff=$cOff\n cOn=$cOn")
      ok
    }
    val r = SCTest.check(propParams(1407L, 25), prop)
    assert(r.passed, s"bucketPairs guard-on vs guard-off components: ${r.status}")
  }
}
