package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023): semantic near-dup pruning WITHIN
  * k-means clusters — the quadratic cosine scoring only ever pairs
  * vectors that share a cluster, so the all-pairs term drops from n²/2
  * to Σ|cluster|²/2. That term is quadratic in CLUSTER SIZE by the
  * operator's definition; the scale knob is k: grow it with the corpus
  * (k ∝ n keeps per-cluster populations bounded, making the pair term
  * linear in n) — SCALING_r14.json measures both arms. A vector is
  * pruned iff some LOWER-id vector in its cluster has cosine ≥
  * `threshold` with it — the deterministic min-id keeper rule, same
  * rounded float arithmetic as q86/q133.
  */
object SemDeDup {

  /** Balanced cluster count for a corpus of n vectors: k ≈ √n equalizes
    * the operator's two quadratic horns — in-cluster pairing Σ|c|²/2
    * (dominates at fixed k: measured superlinear from 10×-sf0.1 up,
    * 557 s at 100×) and exact-Lloyd assignment n·k·d (dominates at
    * k ∝ n: measured marginal exponent 1.24) — at n^1.5/P each; see
    * SCALING_r14{,_30x,_100x}.json, and the balanced posture itself is
    * gated (q214/q214s) + exponent-checked in SCALING_r15+. For true
    * corpus scale prefer the BOUNDED-OUTPUT route — IVF top-k
    * (AnnIndex, gate q85; ladder exponent 0.24) — and use SemDeDup as
    * the cluster-quality variant. q133's fixed-bit sign-LSH pair list
    * is the quadratic class with a 2^bits constant discount (its
    * comment has the measured story); it is a scorer, not the route. */
  def balancedK(n: Long): Int =
    math.max(8, math.round(math.sqrt(n.toDouble)).toInt)

  /** (vec_id, cluster, pruned) for every input vector. */
  def prune(emb: DataFrame, k: Int, updates: Int,
      threshold: Double = 0.45): DataFrame = {
    import graft.functions.VectorExprs.{dotF64, l2normF64}
    val asg = ExactKMeans.run(emb, k = k, updates = updates)
      .withColumn("nrm", l2normF64(col("ed")))
      .select(col("vec_id"), col("cluster"), col("ed"), col("nrm"))
    val a = asg.select(col("cluster"), col("vec_id").as("va"),
      col("ed").as("ea"), col("nrm").as("na"))
    val b = asg.select(col("cluster"), col("vec_id").as("vb"),
      col("ed").as("eb"), col("nrm").as("nb"))
    val pruned = a.join(b, "cluster")
      .where(col("va") < col("vb") &&
        round(dotF64(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
          >= threshold)
      .select(col("vb").as("vec_id")).distinct()
    asg.select(col("vec_id"), col("cluster"))
      .join(pruned.withColumn("p", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("p"), lit(false)).as("pruned"))
  }
}
