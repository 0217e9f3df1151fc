package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank in all-integer arithmetic (the q202 TextRank
  * kernel — see the query's comment for the replay contract): pr is a
  * BIGINT numerator on the 1e-12 grid, contributions are
  * (pr·w) div wdeg, damping is (15·unit + 85·Σmsg) div 100. Every
  * iteration is one join + one aggregate on the symmetric edge list —
  * at production vocab scale the per-iteration frame would be
  * checkpointed; the algebra is iteration-count-fixed and exact.
  */
object TextRank {

  /** @param adj undirected weighted adjacency: columns (a, b, w),
    *            one row per unordered pair. */
  def run(adj: DataFrame, iters: Int = 8): DataFrame = {
    val edges = adj.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(adj.select(col("b").as("src"), col("a").as("dst"), col("w")))
      .persist()
    val deg = edges.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    val unit = deg.agg(count(lit(1)).as("n"))
      .select(expr("1000000000000L div n").as("unit"))
    val seed = deg.crossJoin(broadcast(unit))
      .select(col("src").as("node"), col("wdeg"), col("unit"),
        col("unit").as("pr"))
      .persist()
    var pr = seed
    // Each iteration references the previous pr TWICE (message build +
    // rank join), so the lazy lineage re-expands 2^iters branches.
    // persist() alone is NOT enough: it dedups the computation but the
    // LOGICAL plan still carries the full doubled tree, and rendering
    // it (AQE's plan-update explainString) OOMs the driver long before
    // any data moves — the first cut died exactly there on a 31-node
    // graph. localCheckpoint truncates the lineage itself: each
    // iteration's plan starts from the previous rank TABLE, which is
    // also precisely the per-iteration reliable-checkpoint shape a
    // production vocab-scale run uses.
    for (i <- 1 to iters) {
      // pr is on the 1e12 grid, so (pr * w) stays inside Long only while
      // w ≲ 9.2e6. Spark's non-ANSI multiply would WRAP silently past
      // that while the DuckDB replay raises on BIGINT overflow —
      // divergent failure modes. Compute the product in DECIMAL(38,0)
      // (exact, overflow-proof at any co-occurrence weight) and take
      // the integer quotient there; div yields BIGINT back.
      val msg = edges
        .join(pr.select(col("node").as("src"), col("pr"), col("wdeg")), "src")
        .select(col("dst"), expr(
          "cast((cast(pr as decimal(38,0)) * cast(w as decimal(38,0))) " +
            "div wdeg as bigint)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("msg"))
      pr = pr.drop("pr")
        .join(msg.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), col("wdeg"), col("unit"),
          expr("(15L * unit + 85L * coalesce(msg, 0L)) div 100").as("pr"))
        .localCheckpoint(true)
      // The first localCheckpoint materialized past the seed — drop it.
      if (i == 1) seed.unpersist()
    }
    edges.unpersist()
    pr.select(col("node"), col("pr").as("pr_q"),
      (col("pr").cast("double") / 1e12).as("score"))
  }
}
