package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cache-first bar reads with coverage checking and tail-delta refresh —
  * the reference's single biggest performance feature (20× — /root/
  * reference/etl/yfinance_extractor.py:504-626 cache validity + coverage
  * + partial hit; :456-499 tail-delta fetch; README.md:965).
  *
  * Layout: one parquet dataset per logical source, partitioned by
  * ticker, plus a tiny coverage catalog derived from the data itself
  * (min/max date per ticker — an aggregate over partition-pruned scans,
  * no sidecar files to drift out of sync).
  *
  * Scale: reads prune by `ticker` partition + date predicate pushdown;
  * the delta append only writes the missing tail, never rewrites.
  */
final class CacheManager(spark: SparkSession, cacheDir: String) {

  private def path = s"$cacheDir/bars"

  def isEmpty: Boolean = !Files.exists(Paths.get(path))

  /** (minDate, maxDate) per cached ticker — the coverage catalog. */
  def coverage(): DataFrame = {
    if (isEmpty) return spark.emptyDataFrame
    spark.read.parquet(path)
      .groupBy(col("ticker"))
      .agg(min(col("date")).as("min_date"), max(col("date")).as("max_date"))
  }

  def write(bars: DataFrame): Unit =
    bars.write.mode("append").partitionBy("ticker").parquet(path)

  /** Cache-first read: returns rows covering [start, end] for the
    * tickers whose cache fully covers the range; `fetch` is called ONLY
    * for missing tickers and for stale tails (the delta), and its output
    * is appended to the cache. */
  def read(
      tickers: Seq[String],
      start: java.sql.Timestamp,
      end: java.sql.Timestamp)(
      fetch: (Seq[String], java.sql.Timestamp, java.sql.Timestamp) => DataFrame): DataFrame = {
    val cov: Map[String, (java.sql.Timestamp, java.sql.Timestamp)] =
      if (isEmpty) Map.empty
      else coverage().collect()
        .map(r => r.getString(0) -> (r.getTimestamp(1), r.getTimestamp(2))).toMap

    val missing = tickers.filterNot(cov.contains)
    // head gap: cache starts AFTER the requested start — without this
    // branch such a ticker matched no fetch condition and read() silently
    // returned only the cached suffix (the reference refetches on coverage
    // invalidity, yfinance_extractor.py:536-568). Fetch only [start, lo)
    // so the append stays duplicate-free.
    val headGap = tickers.filter(t => cov.get(t).exists { case (lo, _) =>
      lo.after(start) })
    val staleTail = tickers.filter(t => cov.get(t).exists { case (_, hi) =>
      hi.before(end) })

    if (missing.nonEmpty) write(fetch(missing, start, end))
    headGap.foreach { t =>
      val lo = cov(t)._1
      val head = fetch(Seq(t), start, new java.sql.Timestamp(lo.getTime - 1))
      if (!head.isEmpty) write(head)
    }
    staleTail.foreach { t =>
      val hi = cov(t)._2
      // tail delta: only the bars after the cached high-water mark
      val delta = fetch(Seq(t), new java.sql.Timestamp(hi.getTime + 1), end)
      if (!delta.isEmpty) write(delta)
    }

    spark.read.parquet(path)
      .where(col("ticker").isin(tickers: _*) &&
        col("date").between(start, end))
  }

  /** Hit/miss accounting for a request (mirrors the reference's cache
    * counters, base_extractor.py:64-201). */
  def stats(tickers: Seq[String], start: java.sql.Timestamp,
      end: java.sql.Timestamp): (Int, Int, Int) = {
    val cov = if (isEmpty) Map.empty[String, (java.sql.Timestamp, java.sql.Timestamp)]
    else coverage().collect()
      .map(r => r.getString(0) -> (r.getTimestamp(1), r.getTimestamp(2))).toMap
    val full = tickers.count(t => cov.get(t).exists { case (lo, hi) =>
      !lo.after(start) && !hi.before(end) })
    // partial = cached but not covering (head gap, stale tail, or both)
    val partial = tickers.count(t => cov.get(t).exists { case (lo, hi) =>
      lo.after(start) || hi.before(end) })
    (full, partial, tickers.size - full - partial)
  }
}
