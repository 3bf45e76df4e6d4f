package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the FastSV connected components:
  * ScalaCheck-random graphs (self loops, parallel edges, long paths
  * from the sorted-id construction, disconnected pieces) against an
  * in-memory union-find sharing no code with the DataFrame operator.
  * WCC is the foundation dedup clustering stands on
  * ([[graft.dedup.Dedup.dupClusters]] labels pair-graph components with
  * it), so the pointer-jumping fixpoint gets the same randomized-oracle
  * treatment as the peelers and Brandes: the min-id label must be exact
  * for every vertex on every random shape. */
class WccPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Union-find with path compression; labels = component min id. */
  private def unionFindRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  test("wcc equals in-memory union-find on random multigraphs") {
    val gen = for {
      n <- Gen.choose(4, 40)
      m <- Gen.choose(n / 2, 2 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val sym = edges.flatMap(e => Seq(e, e.swap))
      val got = Algos.wcc(sym.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val want = unionFindRef(edges)
      if (got != want) {
        System.err.println(s"MISMATCH edges=$edges\n got=$got\n want=$want")
      }
      got == want
    }
    val r = SCTest.check(
      propParams(1218L, 10),
      prop)
    assert(r.passed, s"wcc vs in-memory union-find: ${r.status}")
  }
}
