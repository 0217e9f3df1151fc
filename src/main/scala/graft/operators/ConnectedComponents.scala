package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation — the
  * operator that turns near-dup PAIRS (q90/q52/q86) into dedup GROUPS:
  * every document in a component gets the component's minimum doc id as
  * its cluster id, so `doc_id == cluster_id` selects one canonical
  * representative per group and the rest are the removable duplicates.
  *
  * Scale design: each round is one shuffle (edge join + min aggregate);
  * rounds needed = graph diameter. Near-dup graphs are unions of small
  * dense clusters (duplicates of one source document), so the diameter
  * is tiny in practice — for adversarial long-chain graphs use
  * [[runStars]], the alternating large-star/small-star contraction
  * (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii 2014), which
  * converges in O(log² n) rounds worst-case (observed ≈log n) instead
  * of O(diameter). Labels persist per round and unpersist the previous
  * round, so lineage stays O(1) across iterations in both variants.
  */
object ConnectedComponents {

  /** `edges`: two numeric columns (src, dst), undirected (one direction
    * suffices). Returns (node, component) for every endpoint node,
    * component = min node id in the connected component. The result is
    * eagerly `localCheckpoint`ed (one cheap read of the final round's
    * already-pinned cache) and every round cache is released before
    * returning: repeated calls in one session (bench reps, a dedup
    * pipeline clustering many pair sets) pin nothing across calls, and
    * the checkpoint blocks are reclaimed by the ContextCleaner once the
    * caller drops the frame. */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // symmetrize once so propagation flows both ways
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the DataFrame whose cache is currently pinned (unpersist must be
    // called on the EXACT cached plan, not a derived select)
    var pinned = labels
    var converged = false
    var i = 0
    // convergence witness: per-node labels are monotone non-increasing,
    // so the label SUM strictly decreases every non-converged round —
    // one cheap aggregate on the cached frame instead of a probe join.
    // DECIMAL(38,0) accumulation keeps the witness exact (a double sum
    // over ~1e9 64-bit ids could hide a small decrease below ulp)
    var prevSum: java.math.BigDecimal = null
    while (!converged && i < maxIter) {
      // each node takes the min of its own label and its neighbors'
      val next = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
        .union(labels)
        .groupBy(col("node")).agg(min(col("label")).as("new_label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // the aggregate materializes `next`'s cache while the old labels
      // are still pinned (next's lineage reads them); only then is the
      // previous round released — lineage stays one round deep
      val s = next.agg(sum(col("new_label").cast("decimal(38,0)")))
        .head().getDecimal(0)
      // SUM over an empty frame is NULL: an empty edge set has no labels
      // to propagate and is converged by definition (empty result)
      converged = s == null || (prevSum != null && s.compareTo(prevSum) == 0)
      prevSum = s
      pinned.unpersist()
      pinned = next
      labels = next.select(col("node"), col("new_label").as("label"))
      i += 1
    }
    sym.unpersist()
    require(converged, s"connected components did not converge in $maxIter rounds")
    // copy-and-release: materialize the result OFF the round cache
    // (eager local checkpoint = one pass over the pinned frame, and it
    // truncates the N-round lineage so the frame survives the unpersist
    // below without replaying any round), then drop the last round's
    // cache so nothing stays pinned after run() returns
    val out = labels.select(col("node"), col("label").as("component"))
      .localCheckpoint(true)
    pinned.unpersist()
    out
  }
}
