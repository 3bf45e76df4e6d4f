package graft.graph

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Adversarial property check of the mixing panels: per-community
  * modularity decomposition and degree assortativity on random
  * symmetrized graphs vs brute-force recomputation. The exact integer
  * columns (member counts, internal directed-edge counts, degree sums,
  * m, Σdu·dv) must match exactly; the two double outputs (contrib, r)
  * to 1e-12 — shared arithmetic on identical integer operands, only
  * aggregation order differs. Includes the r = NaN regime (degree-
  * regular graphs zero the variance) which a curated fixture never
  * hits. */
class ModularityPropertySpec extends SparkSpec {
  import spark.implicits._

  test("modularity + assortativity match brute force on random graphs") {
    val gen = for {
      n <- Gen.choose(4, 25)
      m <- Gen.choose(n, 3 * n)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    val prop = Prop.forAll(gen) { raw =>
      val pairs = raw.collect {
        case (a, b) if a != b => (math.min(a, b), math.max(a, b))
      }.distinct
      (pairs.nonEmpty: Prop) ==> {
        val sym = pairs.flatMap(e => Seq(e, e.swap))
        val verts = sym.map(_._1).distinct
        val comm = verts.map(v => v -> v % 3)
        val nbrCnt = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }

        // --- modularity oracle ---
        val m2 = sym.size.toDouble
        val cmap = comm.toMap
        val wantMod = comm.groupBy(_._2).map { case (c, members) =>
          val ids = members.map(_._1)
          val degSum = ids.map(nbrCnt).sum
          val internal2 = sym.count { case (u, v) => cmap(u) == c && cmap(v) == c }
          c -> (ids.size.toLong, internal2.toLong, degSum,
            internal2 / m2 - (degSum / m2) * (degSum / m2))
        }
        val modRows = Algos.modularity(sym.toDF("src", "dst"), comm.toDF("id", "community"))
          .as[(Long, Long, Long, Long, Double)].collect()
        val gotMod = modRows.map { case (c, nm, i2, ds, q) => c -> (nm, i2, ds, q) }.toMap
        val modOk = modRows.length == gotMod.size &&
          gotMod.keySet == wantMod.keySet && wantMod.forall {
          case (c, (nm, i2, ds, q)) =>
            val (gn, gi, gd, gq) = gotMod(c)
            gn == nm && gi == i2 && gd == ds && math.abs(gq - q) <= 1e-12
        }

        // --- assortativity oracle (over directed rows of the sym list) ---
        val rows = sym.map { case (u, v) => (nbrCnt(u), nbrCnt(v)) }
        val mm = rows.size.toLong
        val su = rows.map(_._1).sum; val sv = rows.map(_._2).sum
        val suv = rows.map(r0 => r0._1 * r0._2).sum
        val suu = rows.map(r0 => r0._1 * r0._1).sum
        val svv = rows.map(r0 => r0._2 * r0._2).sum
        val wantR = (mm * suv - su * sv).toDouble /
          math.sqrt(((mm * suu - su * su).toDouble * (mm * svv - sv * sv).toDouble))
        val aRows = Algos.assortativity(sym.toDF("src", "dst"))
          .as[(Long, Long, Double)].collect()
        val (gm, gsuv, gr) = aRows.head
        val rOk = aRows.length == 1 && gm == mm && gsuv == suv &&
          ((gr.isNaN && wantR.isNaN) || math.abs(gr - wantR) <= 1e-12)

        if (!(modOk && rOk)) {
          System.err.println(s"MISMATCH pairs=$pairs\n gotMod=$gotMod\n " +
            s"wantMod=$wantMod\n gotR=($gm,$gsuv,$gr) wantR=($mm,$suv,$wantR)")
        }
        modOk && rOk
      }
    }
    val r = SCTest.check(
      propParams(1232L, 10),
      prop)
    assert(r.passed, s"modularity/assortativity vs brute force: ${r.status}")
  }
}
