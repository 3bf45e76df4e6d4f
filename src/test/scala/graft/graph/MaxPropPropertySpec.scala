package graft.graph

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of per-component max-id propagation:
  * random symmetrized multigraphs vs an in-memory union-find labeling
  * components with their MAX id. WccPropertySpec pins the FastSV
  * pointer-jumping path with the min label; this pins the OTHER
  * component labeler — the Pregel message loop (labelProp) with the
  * max combiner and the active/halt protocol — against the same class
  * of random shapes. The two operators share no fixpoint code. */
class MaxPropPropertySpec extends SparkSpec {
  import spark.implicits._

  private def maxRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.min(ra, rb)) = math.max(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // root is the max id because unions always point min → max
    verts.map(v => v -> find(v)).toMap
  }

  test("maxProp equals union-find component max on random multigraphs") {
    val gen = for {
      n <- Gen.choose(4, 40)
      m <- Gen.choose(n / 2, 2 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { edges =>
      val sym = edges.flatMap(e => Seq(e, e.swap))
      val rows = Algos.maxProp(sym.toDF("src", "dst"))
        .as[(Long, Long)].collect()
      val got = rows.toMap
      val want = maxRef(edges)
      val ok = rows.length == got.size && got == want
      if (!ok) {
        System.err.println(s"MISMATCH edges=$edges\n got=$got\n want=$want")
      }
      ok
    }
    val r = SCTest.check(
      propParams(1235L, 10),
      prop)
    assert(r.passed, s"maxProp vs union-find: ${r.status}")
  }
}
