package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank in all-integer arithmetic (the q202 TextRank
  * kernel — see the query's comment for the replay contract): pr is a
  * BIGINT numerator on the 1e-12 grid, contributions are
  * (pr·w) div wdeg, damping is (15·unit + 85·Σmsg) div 100.
  *
  * Iteration shape: the node degrees are STATIC, so wdeg is attached to
  * the edge list once up front and each iteration is exactly one join
  * (edges ⋈ pr on src) + one aggregate (sum by dst) — the old
  * join-back that re-attached (wdeg, unit) to the new ranks is fused
  * away. The rank join-back was only needed to keep rankless nodes
  * alive, and on a SYMMETRIC edge list there are none: every node in
  * pr is the dst of at least one edge whose src is in pr, so the
  * message aggregate already emits every node, every iteration. unit
  * (the 1e12/|V| seed numerator) is a global constant, not a column.
  * At 100 TB (vocab in the millions) the per-iteration frames would be
  * reliably checkpointed; the plan algebra is unchanged.
  */
object TextRank {

  /** @param adj undirected weighted adjacency: columns (a, b, w),
    *            one row per unordered pair. */
  def run(adj: DataFrame, iters: Int = 8): DataFrame = {
    // symmetrize in ONE pass (explode): the old self-union evaluated the
    // adjacency pipeline (q202: a full token-pair aggregation) twice at
    // edgesW materialization and doubled its cached partition count —
    // every iteration's join then read 2× the partitions for the same
    // rows.
    val sym = adj.select(explode(array(
        struct(col("a").as("s"), col("b").as("d"), col("w").as("w")),
        struct(col("b").as("s"), col("a").as("d"), col("w").as("w")))).as("p"))
      .select(col("p.s").as("src"), col("p.d").as("dst"), col("p.w").as("w"))
    val deg = sym.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    // Static per-node degree fused onto the edges once — the table every
    // iteration reads. Its lineage is FIXED (sym ⋈ deg, never grows), so
    // persist() is enough and it can be freed after the loop; only the
    // ITERATED frame needs lineage truncation (see below).
    val edgesW = sym.join(deg, "src").persist()
    // One bounded driver scalar: |V| is the vocab size by construction.
    // An EMPTY adjacency has |V| = 0 — return the empty (node, pr_q,
    // score) frame instead of dividing by it (the pre-fusion form was
    // lazily empty here; the eager scalar must keep that contract).
    val n: Long = edgesW.agg(countDistinct(col("src"))).head().getLong(0)
    if (n == 0L) {
      edgesW.unpersist()
      return adj.select(col("a").as("node")).limit(0)
        .withColumn("pr_q", lit(null).cast("bigint"))
        .withColumn("score", lit(null).cast("double"))
    }
    val unit: Long = 1000000000000L / n

    var pr = edgesW.select(col("src").as("node")).distinct()
      .select(col("node"), lit(unit).as("pr"))
    for (it <- 1 to iters) {
      // pr is on the 1e12 grid, so (pr * w) stays inside Long only while
      // w ≲ 9.2e6. Spark's non-ANSI multiply would WRAP silently past
      // that while the DuckDB replay raises on BIGINT overflow —
      // divergent failure modes. Compute the product in DECIMAL(38,0)
      // (exact, overflow-proof at any co-occurrence weight) and take
      // the integer quotient there; div yields BIGINT back.
      //
      // localCheckpoint every SECOND iteration: each checkpointed plan
      // must start from a TABLE, not a growing lineage (persist() alone
      // dedups the computation but the logical plan still grows per
      // iteration and re-analyzing/rendering it costs more each round —
      // the engine-wide lineage-tax fix). pr appears exactly ONCE per
      // iteration, so a 2-deep un-checkpointed chain recomputes nothing;
      // cadence 2 keeps the plan O(1) while halving the eager
      // materialization jobs (r19: 8 → 4 checkpoint jobs per run).
      pr = edgesW
        .join(pr.select(col("node").as("src"), col("pr")), "src")
        .select(col("dst"), expr(
          "cast((cast(pr as decimal(38,0)) * cast(w as decimal(38,0))) " +
            "div wdeg as bigint)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("msg"))
        .select(col("dst").as("node"),
          expr(s"(15L * ${unit}L + 85L * msg) div 100").as("pr"))
      if (it % 2 == 0 || it == iters) pr = pr.localCheckpoint(true)
    }
    edgesW.unpersist()
    pr.select(col("node"), col("pr").as("pr_q"),
      (col("pr").cast("double") / 1e12).as("score"))
  }
}
