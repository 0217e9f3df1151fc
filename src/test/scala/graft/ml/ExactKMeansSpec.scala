package graft.ml

import java.math.{BigDecimal => JBD, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ml/ExactKMeans (q138) and the SemDeDup pruning built on it (q139):
  * the distributed kernel must agree with an independent driver-side
  * replay of the documented semantics — grid-exact integer distance
  * sums (per-dim qfloor at 1e6, LONG squares), min-(dist, cluster)
  * argmin, grid-exact centroid means — and Lloyd's objective must not
  * increase across update rounds. */
class ExactKMeansSpec extends AnyFunSuite with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  private def emb = graft.Tables.load(spark, dir, "embeddings")

  /** Per-dim difference quantized half-up at the 1e6 grid (clamped like
    * Det.qfloor), integer squares summed in LONG, /1e12 — the spec'd
    * grid-exact arithmetic of ExactKMeans.dist2To. */
  private def dist2(v: Array[Double], c: Array[Double]): Double = {
    var s = 0L
    var i = 0
    while (i < v.length) {
      val d = v(i) - c(i)
      val q = math.floor(
        math.max(math.min(d * 1e6 + 0.5, 9.2e18), -9.2e18)).toLong
      s += q * q
      i += 1
    }
    s.toDouble / 1e12
  }

  test("out-of-scale input fails loud from fit() on every update count") {
    val s = spark; import s.implicits._
    // |x| > 100 violates the LONG-fold bound; fit() must throw before
    // any result escapes, whatever the update count (r19 pinned this
    // while experimenting with the gate's placement).
    val bad = Seq((1L, Seq(0.1, 250.0)), (2L, Seq(0.2, 0.3)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      ExactKMeans.fit(bad, k = 1, updates = 1)
    }
    assert(e1.getMessage.contains("out of scale"))
    val e0 = intercept[IllegalArgumentException] {
      ExactKMeans.fit(bad, k = 1, updates = 0)
    }
    assert(e0.getMessage.contains("out of scale"))
  }

  test("q138 assignment is the exact argmin against the final centroids") {
    val s = spark; import s.implicits._
    val (asgDf, cents) = ExactKMeans.fit(emb, k = 8, updates = 2)
    val asg = asgDf.select($"vec_id", $"ed", $"cluster", $"dist2".cast("double"))
      .as[(Long, Seq[Double], Int, Double)].collect()
    assert(asg.length === emb.count())
    assert(asg.map(_._3).toSet.subsetOf((0 until 8).toSet))
    asg.foreach { case (id, ed, cl, d2) =>
      val v = ed.toArray
      val ds = cents.zipWithIndex.map { case (c, j) => (dist2(v, c), j) }
      val (bd, bj) = ds.minBy { case (d, j) => (d, j) }
      assert(bj === cl, s"vec $id assigned $cl, argmin is $bj")
      assert(bd === d2, s"vec $id dist2 off (grid-exact must be equal)")
    }
  }

  test("Lloyd objective is non-increasing over update rounds") {
    val s = spark; import s.implicits._
    val objs = (0 to 2).map { u =>
      ExactKMeans.fit(emb, k = 8, updates = u)._1
        .agg(org.apache.spark.sql.functions.sum($"dist2"))
        .head().getDouble(0)
    }
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"objective rose: $objs")
    }
  }

  test("q139 prunes exactly the vectors with a lower-id in-cluster near-dup") {
    val s = spark; import s.implicits._
    val got = graft.queries.CorpusQueries.queries("q139_semdedup")(s, dir)
      .as[(Long, Int, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val vecs = ExactKMeans.fit(emb, k = 8, updates = 2)._1
      .select($"vec_id", $"ed", $"cluster")
      .as[(Long, Seq[Double], Int)].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      new JBD(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, RoundingMode.HALF_UP).doubleValue
    }
    vecs.foreach { case (id, ed, cl) =>
      val expect = vecs.exists { case (id2, ed2, cl2) =>
        cl2 == cl && id2 < id && cos(ed, ed2) >= 0.45
      }
      assert(got(id) === ((cl, expect)), s"vec $id")
    }
    // the threshold actually bites at this scale: some but not all pruned
    val np = got.values.count(_._2)
    assert(np > 0 && np < got.size)
  }

  test("kernel assignment path is bit-identical to the expression path") {
    // Large k switches assignment from k literal fold expressions (plan
    // size grows with k — the 10x sweep measured k=80 spending ~50 s in
    // plan/codegen overhead) to a broadcast-centroid kernel. Both paths
    // must compute the SAME grid-exact argmin, including double-image
    // distance ties breaking to the lowest cluster id. Duplicate
    // centroids (rows 0 and 2) force exact ties.
    val s = spark; import s.implicits._
    val ed = emb.select($"vec_id", $"embedding".cast("array<double>").as("ed"))
    val cents = ed.orderBy($"vec_id").limit(20)
      .select($"ed").as[Seq[Double]].collect().map(_.toArray)
    cents(2) = cents(0).clone() // exact duplicate => tie on every row
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cluster", $"dist2".cast("double"))
        .collect().map(_.toString).sorted
    val e = rowsOf(ExactKMeans.assignExpr(ed, cents))
    val k = rowsOf(ExactKMeans.assignKernel(ed, cents))
    assert(e.sameElements(k))
    // the duplicate's tie resolved to cluster 0, never 2 — on both paths
    assert(ExactKMeans.assignKernel(ed, cents)
      .where($"cluster" === 2).isEmpty)
    assert(ExactKMeans.assignExpr(ed, cents)
      .where($"cluster" === 2).isEmpty)
  }

  test("SemDeDup.balancedK tracks sqrt(n) with the small-corpus floor") {
    assert(SemDeDup.balancedK(0) === 8)
    assert(SemDeDup.balancedK(64) === 8)
    assert(SemDeDup.balancedK(10000) === 100)
    assert(SemDeDup.balancedK(1000000) === 1000)
  }

  test("q143 mixture cells conserve mass and purity is the majority share") {
    val s = spark; import s.implicits._
    val rows = graft.queries.CorpusQueries.queries("q143_cluster_mix")(s, dir)
      .as[(Int, Int, Long, Double)].collect()
    assert(rows.map(_._3).sum === emb.count())
    rows.groupBy(_._1).foreach { case (cl, cells) =>
      val tot = cells.map(_._3).sum
      val expect = cells.map(_._3).max.toDouble / tot
      cells.foreach { c =>
        assert(math.abs(c._4 - expect) < 1e-12, s"purity off in cluster $cl")
      }
      assert(expect >= 1.0 / tot && expect <= 1.0)
    }
  }
}
