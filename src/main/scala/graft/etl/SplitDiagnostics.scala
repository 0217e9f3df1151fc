package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split drift diagnostics — rebuild of /root/reference/etl/
  * split_diagnostics.py:25-80: PSI over 10 train-quantile bins, mean/std
  * deltas and volatility ratio between train and each other split, plus
  * the non-overlap assertion (:81).
  *
  * Scale design: train deciles are computed once per ticker (exact
  * `percentile` — small per-ticker arrays; swap to percentile_approx at
  * true 100 TB cardinality), broadcast as a tiny dim, and both sides are
  * bucketed in one pass each.
  */
object SplitDiagnostics {

  /** PSI of `valueCol` between the rows tagged `trainTag` and `otherTag`
    * in `splitCol`, per ticker, using nBins train-quantile bins. */
  def psi(
      df: DataFrame,
      valueCol: String,
      splitCol: String = "split",
      trainTag: String = "training",
      otherTag: String = "validation",
      nBins: Int = 10,
      eps: Double = 1e-6): DataFrame = {
    val train = df.where(col(splitCol) === trainTag)
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val cuts = train.groupBy("ticker")
      .agg(percentile_approx(col(valueCol), typedLit(probs), lit(10000)).as("cuts"))
    val bucketed = df.where(col(splitCol).isin(trainTag, otherTag))
      .join(broadcast(cuts), "ticker")
      .withColumn("bin", expr(
        s"size(filter(cuts, c -> c <= $valueCol))")) // 0..nBins-1
    val counts = bucketed.groupBy("ticker", "bin").agg(
      sum(when(col(splitCol) === trainTag, 1).otherwise(0)).as("n_a"),
      sum(when(col(splitCol) === otherTag, 1).otherwise(0)).as("n_b"))
    val tot = counts.groupBy("ticker")
      .agg(sum("n_a").as("t_a"), sum("n_b").as("t_b"))
    counts.join(tot, "ticker")
      .withColumn("p", col("n_a").cast("double") / col("t_a") + eps)
      .withColumn("q", col("n_b").cast("double") / col("t_b") + eps)
      .groupBy("ticker")
      .agg(sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"))
  }

  /** Mean/std deltas + volatility ratio between two splits per ticker. */
  def momentDrift(
      df: DataFrame,
      valueCol: String,
      splitCol: String = "split",
      trainTag: String = "training",
      otherTag: String = "validation"): DataFrame = {
    val a = when(col(splitCol) === trainTag, col(valueCol))
    val b = when(col(splitCol) === otherTag, col(valueCol))
    df.where(col(splitCol).isin(trainTag, otherTag))
      .groupBy("ticker").agg(
        (avg(b) - avg(a)).as("mean_delta"),
        (stddev_samp(b) - stddev_samp(a)).as("std_delta"),
        when(stddev_samp(a) =!= 0.0, stddev_samp(b) / stddev_samp(a)).as("vol_ratio"))
  }

  /** True iff the two splits share no (ticker, date) key — reference
    * split non-overlap validation (etl/split_diagnostics.py:81). */
  def nonOverlapping(
      df: DataFrame,
      splitCol: String = "split",
      tagA: String = "training",
      tagB: String = "validation"): Boolean = {
    val a = df.where(col(splitCol) === tagA).select("ticker", "date")
    val b = df.where(col(splitCol) === tagB).select("ticker", "date")
    a.intersect(b).isEmpty
  }
}
