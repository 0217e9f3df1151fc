package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition counts derived from the DATA, not from a constant.
  *
  * `spark.sql.shuffle.partitions` is the cluster-scale knob, and AQE
  * right-sizes SQL exchanges against it — but RDD-level operators
  * (ChunkedWindow's range shuffle) see no AQE and were spreading
  * kilobyte inputs across the full constant: at sf0.1 every 32-task
  * stage paid ~0.2 s of per-task fixed cost to process ~3k rows each
  * (measured, QueryProfile r19), ~100× the useful work. This helper is
  * the AQE-equivalent sizing rule for those operators: partitions =
  * ceil(optimizer-estimated bytes / `targetBytes`), clamped to
  * [1, spark.sql.shuffle.partitions].
  *
  * Scale behavior: the estimate grows with the input, so a 100 TB frame
  * hits the session cap immediately — at cluster scale this is exactly
  * the old `shuffle.partitions` behavior, configured where it always
  * was. Only a small input (estimated ≪ cap × target) gets fewer, fuller
  * partitions. `targetBytes` defaults to 256 KB of PLAN-estimated size
  * (parquet-compressed for scans — several× smaller than in-memory), the
  * measured balance point where per-task fixed cost stops dominating
  * per-row work for the engine's compute-dense kernels while keeping a
  * few-MB input multi-core (512 KB read ~0.2 s slower on q11/q17 in the
  * alternating A/B — the moment kernel still wants ~10 partitions on a
  * 2 MB input).
  */
object SizedPartitions {

  def of(df: DataFrame, targetBytes: Long = 256L << 10): Int = {
    val cap = df.sparkSession.sessionState.conf.numShufflePartitions
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (bytes + targetBytes - 1) / targetBytes
    if (n < 1) 1 else if (n > cap) cap else n.toInt
  }
}
