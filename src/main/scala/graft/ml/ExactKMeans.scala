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
  *  - Determinism at 1000 executors — GRID-EXACT arithmetic (round 12,
  *    retiring the decimal-cast tie class): each per-dim difference is
  *    quantized ONCE at the 1e6 grid (Det.qfloor — pure IEEE, identical
  *    in every engine) and the integer squares fold in plain LONG
  *    arithmetic, exact and order-free; dist2 = Σq²/1e12 as DOUBLE.
  *    No double→decimal rounding of a computed product anywhere, so the
  *    q83 last-digit tie class is structurally impossible, and the fold
  *    is whole-stage-codegen LONG math instead of interpreted decimals —
  *    the hybrid double-prefilter the decimal fold needed is GONE.
  *    Argmin ties break to the lowest cluster id (lexicographic struct
  *    sort). Centroid update: grid-exact 1e9 sum, double division by
  *    the count. The DuckDB oracle (CorpusQueries q138) replays the
  *    identical integer arithmetic and hash-matches with NO tolerance.
  *  - Init is the k lowest vec_ids (deterministic, re-runnable); an
  *    empty cluster keeps its previous centroid.
  */
object ExactKMeans {

  private val dec0 = DecimalType(38, 0)

  /** Squared-L2 distance to a literal centroid — grid-exact: per-dim
    * q = qfloor(x−c, 1e6) (|q| ≤ 2e8 at the |x| ≤ 100 gate), Σq² ≤
    * dims·4e16 ≈ 2.6e18 at dims=64 — inside LONG with 3.5× headroom.
    * Returns Σq²/1e12 as DOUBLE. */
  private def dist2To(c: Array[Double]): Column =
    aggregate(
      zip_with(col("ed"), typedLit(c.toSeq), (x, cc) => {
        val q = graft.queries.Det.qfloor(x - cc, 1e6)
        q * q
      }),
      lit(0L),
      (acc, v) => acc + v)
      .cast("double") / 1e12

  /** Above this k the assignment switches from k literal fold
    * expressions to the broadcast-centroid kernel: the expression form's
    * PLAN grows with k (k × dims literal folds inside one sort_array),
    * and past a few dozen centroids Janino compilation and plan analysis
    * dominate wall time — the 10× scale sweep measured k=80 at 20k rows
    * spending ~50 s in plan overhead for sub-second data work. Both
    * paths compute the identical grid-exact arithmetic (spec-pinned
    * equal output), so the switch is invisible to results. */
  private val kernelAssignThreshold = 16

  /** Attach (cluster, dist2) = argmin over the centroid set; ties
    * (exact on the quantized grid, including duplicate centroids from
    * empty clusters) break to the lowest cluster id. Small k: literal
    * fold expressions (whole-stage codegen, zero overhead per plan).
    * Large k: one broadcast of the k×dim matrix + a per-partition
    * kernel computing the SAME long fold — plan size now constant in k,
    * per-row cost the same O(k·dim). */
  private[graft] def withAssign(ed: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    // Contract: exactly (vec_id: bigint, ed) — the kernel path narrows
    // its output to these two + (cluster, dist2) and casts vec_id to
    // long, while the expression path passes columns through; enforcing
    // the shape HERE means the k>16 switch can never change the output
    // schema out from under a caller (fit() always conforms today; this
    // turns "currently benign" into "structurally impossible").
    require(ed.columns.sameElements(Array("vec_id", "ed")),
      s"withAssign expects exactly (vec_id, ed), got ${ed.columns.mkString(",")}")
    require(ed.schema("vec_id").dataType ==
      org.apache.spark.sql.types.LongType,
      s"withAssign expects vec_id: bigint, got ${ed.schema("vec_id").dataType}")
    if (cents.length <= kernelAssignThreshold) assignExpr(ed, cents)
    else assignKernel(ed, cents)
  }

  private[graft] def assignExpr(ed: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val cand = cents.zipWithIndex.map { case (c, j) =>
      struct(dist2To(c).as("dist2"), lit(j).as("cluster"))
    }
    val best = sort_array(array(cand.toIndexedSeq: _*)).getItem(0)
    ed.withColumn("best", best)
      .select(col("vec_id"), col("ed"),
        col("best.cluster").as("cluster"), col("best.dist2").as("dist2"))
  }

  private[graft] def assignKernel(ed: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val s = ed.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    ed.select(col("vec_id").cast("long"), col("ed"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, e) =>
          val x = e.toArray
          var bestJ = 0
          var bestD = Double.MaxValue
          var j = 0
          while (j < cs.length) {
            val c = cs(j)
            var acc = 0L
            var i = 0
            while (i < x.length) {
              // Det.qfloor(x − c, 1e6): floor of the ±9.2e18-clamped
              // (x−c)·1e6 + 0.5 as LONG, squared and folded in exact
              // long arithmetic (the clamp never fires inside the
              // |x| ≤ 100 scale gate; mirrored for bit parity)
              val q = math.floor(math.max(math.min(
                (x(i) - c(i)) * 1e6 + 0.5, 9.2e18), -9.2e18)).toLong
              acc += q * q
              i += 1
            }
            // compare on the DOUBLE image (Σq²/1e12), exactly like the
            // expression path's struct sort; strict < keeps the lowest
            // cluster id on ties
            val d = acc.toDouble / 1e12
            if (d < bestD) { bestD = d; bestJ = j }
            j += 1
          }
          (id, e, bestJ, bestD)
        }
      }
      .toDF("vec_id", "ed", "cluster", "dist2")
  }

  /** `updates` Lloyd rounds from the k-lowest-vec_id init; returns the
    * final assignment (vec_id, ed, cluster, dist2 DOUBLE on the 1e-12
    * grid) and the final centroids. */
  def fit(emb: DataFrame, k: Int, updates: Int): (DataFrame, Array[Array[Double]]) = {
    val s = emb.sparkSession
    import s.implicits._
    // vec_id normalized to bigint up front — withAssign's shape contract
    val ed = emb.select($"vec_id".cast("long").as("vec_id"),
      $"embedding".cast("array<double>").as("ed"))
    // Loud scale gate for the LONG-fold bound above: |x| ≤ 100 keeps
    // per-dim q ≤ 2e8 and Σq² ≤ 2.6e18 at dims ≤ 64 — fail here instead
    // of silently overflowing the fold on out-of-scale input. One extra
    // flat pass, once per fit. (r19 tried folding this scan onto round
    // 1's job via `observe`; the CollectMetrics node cost MORE than the
    // job it saved — q138 +20% in an alternating same-box A/B — so the
    // eager pass stays. ExactKMeansSpec pins the loud failure.)
    val maxAbs = ed.select(max(expr(
      "aggregate(ed, cast(0.0 as double), (a, x) -> greatest(a, abs(x)))")))
      .head().getDouble(0)
    require(maxAbs <= 100.0,
      s"ExactKMeans input out of scale: max |embedding dim| = $maxAbs > 100 — " +
        "the grid-exact LONG distance fold assumes near-unit-scale " +
        "embeddings; normalize the input first")
    var cents: Array[Array[Double]] = ed.orderBy($"vec_id").limit(k)
      .select($"ed").as[Seq[Double]].collect().map(_.toArray)
    var u = 0
    while (u < updates) {
      val upd = withAssign(ed, cents)
        .select($"cluster", posexplode($"ed").as(Seq("d", "x")))
        .groupBy($"cluster", $"d")
        .agg(((sum(graft.queries.Det.qfloor($"x", 1e9).cast(dec0))
          .cast("double") / 1e9) / count(lit(1))).as("c"))
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
