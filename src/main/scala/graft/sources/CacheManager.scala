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

  /** Delta-fetch bounds MUST be computed at the timestamps' own
    * precision (graft.Times, epoch micros): with millisecond arithmetic,
    * provider bars in the same millisecond as a coverage edge (ts in
    * [floor_ms(lo), lo)) were never fetched and read() silently returned
    * an incomplete range. */
  private def micros(ts: java.sql.Timestamp): Long = graft.Times.micros(ts)

  private def tsOfMicros(us: Long): java.sql.Timestamp =
    graft.Times.ofMicros(us)

  def isEmpty: Boolean = !Files.exists(Paths.get(path))

  /** Earliest start (epoch micros) already head-probed per ticker. Once the
    * provider has been asked for [start, cachedLo) — whatever it
    * returned — re-asking for the same or a later start can never add
    * rows, so the head-gap branch skips it; without this mark a ticker
    * whose history simply begins after `start` (pre-listing dates) was
    * re-fetched on EVERY read forever. Delete the sidecar to force a
    * re-probe (e.g. after a provider backfill).
    *
    * The filename carries the unit (`_us` = epoch MICROS): the sidecar's
    * values changed meaning from millis to micros when the delta bounds
    * went micros-precise, and a legacy millis-valued file read as micros
    * would be ~1000× too small — `probes.get(t).forall(_ > micros(start))`
    * would go false and the head-gap fetch would be silently skipped
    * forever. A legacy `head_probes.json` is therefore IGNORED (and
    * deleted on the next save): its marks are discarded, which at worst
    * re-probes a head range once — fail-open, never fail-silent. */
  private def probesPath = Paths.get(s"$cacheDir/head_probes_us.json")

  private def legacyProbesPath = Paths.get(s"$cacheDir/head_probes.json")

  private def loadProbes(): Map[String, Long] =
    if (!Files.exists(probesPath)) Map.empty
    else """"([^"]+)":(-?\d+)""".r
      .findAllMatchIn(new String(Files.readAllBytes(probesPath), "UTF-8"))
      .map(m => m.group(1) -> m.group(2).toLong).toMap

  private def saveProbes(m: Map[String, Long]): Unit = {
    val json = m.toSeq.sortBy(_._1)
      .map { case (t, v) => "\"" + t + "\":" + v }.mkString("{", ",", "}")
    val tmp = Paths.get(s"$cacheDir/.head_probes_tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, probesPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Files.deleteIfExists(legacyProbesPath) // superseded millis-unit sidecar
  }

  /** (minDate, maxDate) per cached ticker — the coverage catalog. */
  def coverage(): DataFrame = {
    if (isEmpty) return spark.emptyDataFrame
    spark.read.parquet(path)
      .groupBy(col("ticker"))
      .agg(min(col("date")).as("min_date"), max(col("date")).as("max_date"))
  }

  /** Coverage rows for one request's tickers, as a driver map — the
    * isin filter prunes to the requested ticker PARTITIONS before the
    * aggregate, so the collected map is bounded by the request size,
    * not by how many tickers the cache has accumulated. */
  private def coverageOf(tickers: Seq[String])
      : Map[String, (java.sql.Timestamp, java.sql.Timestamp)] =
    if (isEmpty) Map.empty
    else spark.read.parquet(path)
      .where(col("ticker").isin(tickers: _*))
      .groupBy(col("ticker"))
      .agg(min(col("date")).as("min_date"), max(col("date")).as("max_date"))
      .collect()
      .map(r => r.getString(0) -> (r.getTimestamp(1), r.getTimestamp(2))).toMap

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
    val cov = coverageOf(tickers)

    val missing = tickers.filterNot(cov.contains)
    // head gap: cache starts AFTER the requested start — without this
    // branch such a ticker matched no fetch condition and read() silently
    // returned only the cached suffix (the reference refetches on coverage
    // invalidity, yfinance_extractor.py:536-568). Fetch only [start, lo)
    // so the append stays duplicate-free; skip starts already probed
    // (the provider may simply have no earlier history — without the
    // probe mark that head range re-fetched on every read, forever).
    val probes = loadProbes()
    val headGap = tickers.filter(t => cov.get(t).exists { case (lo, _) =>
      lo.after(start) } && probes.get(t).forall(_ > micros(start)))
    val staleTail = tickers.filter(t => cov.get(t).exists { case (_, hi) =>
      hi.before(end) })

    if (missing.nonEmpty) write(fetch(missing, start, end))
    if (headGap.nonEmpty) {
      headGap.foreach { t =>
        val lo = cov(t)._1
        val head = fetch(Seq(t), start, tsOfMicros(micros(lo) - 1))
        if (!head.isEmpty) write(head)
      }
      // whatever came back is cached now: [start, lo) is settled
      saveProbes(probes ++ headGap.map(t =>
        t -> math.min(probes.getOrElse(t, Long.MaxValue), micros(start))))
    }
    staleTail.foreach { t =>
      val hi = cov(t)._2
      // tail delta: only the bars after the cached high-water mark
      val delta = fetch(Seq(t), tsOfMicros(micros(hi) + 1), end)
      if (!delta.isEmpty) write(delta)
    }

    spark.read.parquet(path)
      .where(col("ticker").isin(tickers: _*) &&
        col("date").between(start, end))
  }

  /** Per-ticker cache status for a request — the row-level form of
    * [[stats]]: (ticker, min_date, max_date, status) with status ∈
    * full | head_gap | stale_tail | head_and_tail | miss, using the
    * SAME strict after/before comparisons read() routes on. Bounded by
    * the request (coverageOf prunes to the requested partitions), so
    * the report costs one aggregate however many tickers the cache has
    * accumulated. */
  def statusOf(tickers: Seq[String], start: java.sql.Timestamp,
      end: java.sql.Timestamp): DataFrame = {
    val cov = coverageOf(tickers)
    val rows = tickers.sorted.map { t =>
      cov.get(t) match {
        case None => (t, None: Option[java.sql.Timestamp],
          None: Option[java.sql.Timestamp], "miss")
        case Some((lo, hi)) =>
          val status = (lo.after(start), hi.before(end)) match {
            case (false, false) => "full"
            case (true, false)  => "head_gap"
            case (false, true)  => "stale_tail"
            case (true, true)   => "head_and_tail"
          }
          (t, Some(lo), Some(hi), status)
      }
    }
    import spark.implicits._
    rows.toDF("ticker", "min_date", "max_date", "status")
  }

  /** Hit/miss accounting for a request (mirrors the reference's cache
    * counters, base_extractor.py:64-201). */
  def stats(tickers: Seq[String], start: java.sql.Timestamp,
      end: java.sql.Timestamp): (Int, Int, Int) = {
    val cov = coverageOf(tickers)
    val full = tickers.count(t => cov.get(t).exists { case (lo, hi) =>
      !lo.after(start) && !hi.before(end) })
    // partial = cached but not covering (head gap, stale tail, or both)
    val partial = tickers.count(t => cov.get(t).exists { case (lo, hi) =>
      lo.after(start) || hi.before(end) })
    (full, partial, tickers.size - full - partial)
  }
}
