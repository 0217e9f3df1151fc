package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed Lloyd's k-means over the embedding table with ORACLE-EXACT
  * arithmetic — the semantic-clustering front of the SemDeDup pipeline
  * (cluster first so near-dup scoring only ever pairs vectors inside one
  * cluster; reference semantics: the dedup/quality family of
  * `etl/data_preprocessor.py`, clustering sibling of `ml/AnnIndex`'s
  * coarse quantizer).
  *
  * Scale design — the MLlib aggregate→collect→broadcast round shape:
  *  - Centroids live on the DRIVER between rounds (k×dim doubles — dims-
  *    sized at any corpus scale) and enter each round's plan as LITERAL
  *    arrays, so every round is one flat pass over the data: scan →
  *    per-row argmin (k codegen'd fold expressions, no join, no shuffle)
  *    → posexplode → partial-aggregated (cluster, dim) sums. Shuffle
  *    volume per round is k·dim·partitions rows, independent of corpus
  *    size; plan depth is CONSTANT per round (no iterative lineage
  *    blowup, nothing to checkpoint).
  *  - Determinism at 1000 executors: per-dim squared differences are
  *    exact doubles cast to DECIMAL(38,12) and summed — decimal addition
  *    is associative, so partition order and AQE re-planning cannot move
  *    a distance by an ulp. Argmin ties break to the lowest cluster id
  *    (lexicographic struct sort). Centroid update is the Det.davg12
  *    idiom: exact decimal sum, double division by the count. The DuckDB
  *    oracle (CorpusQueries q138) replays the identical decimal
  *    arithmetic and hash-matches with NO tolerance.
  *  - Init is the k lowest vec_ids (deterministic, re-runnable); an
  *    empty cluster keeps its previous centroid.
  */
object ExactKMeans {

  private val dec12 = DecimalType(38, 12)

  // Fold accumulator type: precision 20 keeps each addition's result type
  // at (21,12) — under the 38 cap — so Spark never applies its silent
  // precision-loss scale reduction ((38,12)+(38,12) → 39 overflows and
  // drops to scale 11, which would desync the fold from DuckDB's exact
  // SUM(DECIMAL(38,12)) by ~1e-12 per step). 8 integral digits bound any
  // realistic per-row distance; dims and magnitudes here use <5.
  private val decAcc = DecimalType(20, 12)

  /** Squared-L2 distance to a literal centroid: each per-dim (x−c)² is an
    * exact double whose DECIMAL(.,12) cast rounds identically on both
    * engines, and the decimal sum is order-free and loss-free. */
  private def dist2To(c: Array[Double]): Column =
    aggregate(
      zip_with(col("ed"), typedLit(c.toSeq),
        (x, cc) => ((x - cc) * (x - cc)).cast(decAcc)),
      lit(java.math.BigDecimal.ZERO).cast(decAcc),
      (acc, v) => (acc + v).cast(decAcc))
      .cast(dec12)

  // Cheap-filter margin for the hybrid argmin below. The codegen double
  // distance (‖x‖² − 2x·c + ‖c‖² rearrangement) and the oracle's decimal
  // sum of per-dim squares differ by at most ~dims·(fold ulps + the
  // 5e-13 half-ulp of each scale-12 cast) ≈ 1e-10 at unit-scale
  // embeddings — so when the double winner leads by more than this
  // margin, the decimal argmin provably agrees and the per-row cost
  // drops from k interpreted decimal folds to k codegen dots + ONE
  // decimal fold. Contested rows (and exact centroid duplicates from
  // empty clusters) take the full decimal sort.
  private val argminMargin = 1e-6

  /** Attach (cluster, dist2) = argmin over the literal centroid set; ties
    * break to the lowest cluster id via the lexicographic struct sort.
    * dist2 is ALWAYS the decimal sum (the oracle arithmetic) — the
    * double distances only select which single fold to evaluate. */
  private def withAssign(ed: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    import graft.functions.VectorExprs.dotF64
    val decCand = cents.zipWithIndex.map { case (c, j) =>
      struct(dist2To(c).as("dist2"), lit(j).as("cluster"))
    }
    val dblCand = cents.zipWithIndex.map { case (c, j) =>
      val c2 = c.foldLeft(0.0)((a, v) => a + v * v)
      struct((col("sq") - lit(2.0) * dotF64(col("ed"), typedLit(c.toSeq)) +
        lit(c2)).as("d"), lit(j).as("cluster"))
    }
    val sortedD = sort_array(array(dblCand.toIndexedSeq: _*))
    val bestD = sortedD.getItem(0)
    val safe = (sortedD.getItem(1).getField("d") - bestD.getField("d")) >
      lit(argminMargin)
    val cheapCluster = bestD.getField("cluster")
    // CASE WHEN is lazy per row: exactly one decimal fold runs here
    val cheapDist2 = cents.indices.tail.foldLeft(
      when(cheapCluster === 0, dist2To(cents(0)))) { (acc, j) =>
      acc.when(cheapCluster === j, dist2To(cents(j)))
    }
    val slowBest = sort_array(array(decCand.toIndexedSeq: _*)).getItem(0)
    ed.withColumn("sq", dotF64(col("ed"), col("ed")))
      .withColumn("best",
        when(safe, struct(cheapDist2.as("dist2"), cheapCluster.as("cluster")))
          .otherwise(slowBest))
      .select(col("vec_id"), col("ed"),
        col("best.cluster").as("cluster"), col("best.dist2").as("dist2"))
  }

  /** `updates` Lloyd rounds from the k-lowest-vec_id init; returns the
    * final assignment (vec_id, ed, cluster, dist2 DECIMAL(38,12)) and the
    * final centroids. */
  def fit(emb: DataFrame, k: Int, updates: Int): (DataFrame, Array[Array[Double]]) = {
    val s = emb.sparkSession
    import s.implicits._
    val ed = emb.select($"vec_id", $"embedding".cast("array<double>").as("ed"))
    // Loud scale gate for the two comment-documented assumptions above:
    // decAcc(20,12) overflows to NULL (non-ANSI cast) once any (x−c)² ≥
    // 1e8, and the 1e-6 hybrid-argmin margin's error analysis assumes
    // near-unit magnitudes. |x| ≤ 100 keeps (x−c)² ≤ 4e4 (4 orders from
    // overflow) and the double-vs-decimal discrepancy ≤ ~1e-8 at
    // dims ≤ 64 — fail here instead of silently desyncing from the
    // oracle on out-of-scale input. One extra flat pass, once per fit.
    val maxAbs = ed.select(max(expr(
      "aggregate(ed, cast(0.0 as double), (a, x) -> greatest(a, abs(x)))")))
      .head().getDouble(0)
    require(maxAbs <= 100.0,
      s"ExactKMeans input out of scale: max |embedding dim| = $maxAbs > 100 — " +
        "the DECIMAL(20,12) fold and the 1e-6 argmin margin assume " +
        "near-unit-scale embeddings; normalize the input first")
    var cents: Array[Array[Double]] = ed.orderBy($"vec_id").limit(k)
      .select($"ed").as[Seq[Double]].collect().map(_.toArray)
    var u = 0
    while (u < updates) {
      val upd = withAssign(ed, cents)
        .select($"cluster", posexplode($"ed").as(Seq("d", "x")))
        .groupBy($"cluster", $"d")
        .agg((sum($"x".cast(dec12)).cast("double") / count(lit(1))).as("c"))
        .collect()
      val next = cents.map(_.clone()) // an empty cluster keeps its centroid
      upd.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      cents = next
      u += 1
    }
    (withAssign(ed, cents), cents)
  }

  def run(emb: DataFrame, k: Int, updates: Int): DataFrame =
    fit(emb, k, updates)._1
}
