package graft.sources

import org.apache.hadoop.fs.Path
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

  /** All existence probes and sidecar I/O go through the Hadoop
    * FileSystem RESOLVED FROM cacheDir — the same resolution the Spark
    * writes use. The old java.nio probes answered against the LOCAL
    * disk, so any non-local cacheDir (hdfs://, s3a://) read as
    * permanently empty: every read() refetched and re-appended the full
    * range, and the final (correctly-resolved) parquet read returned
    * growing duplicates. */
  private def fs = new Path(cacheDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def isEmpty: Boolean = !fs.exists(new Path(path))

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
  private def probesPath = new Path(s"$cacheDir/head_probes_us.json")

  private def legacyProbesPath = new Path(s"$cacheDir/head_probes.json")

  private def loadProbes(): Map[String, Long] =
    if (!fs.exists(probesPath)) Map.empty
    else {
      val in = fs.open(probesPath)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      """"([^"]+)":(-?\d+)""".r.findAllMatchIn(raw)
        .map(m => m.group(1) -> m.group(2).toLong).toMap
    }

  private def saveProbes(m: Map[String, Long]): Unit = {
    val json = m.toSeq.sortBy(_._1)
      .map { case (t, v) => "\"" + t + "\":" + v }.mkString("{", ",", "}")
    val tmp = new Path(s"$cacheDir/.head_probes_tmp")
    val out = fs.create(tmp, true)
    try { out.write(json.getBytes("UTF-8")) } finally out.close()
    // replace-by-rename: HDFS rename refuses an existing destination, so
    // drop the old sidecar first. The delete→rename window is fail-OPEN
    // (a crash loses marks, which at worst re-probes each head once —
    // the sidecar's documented recovery semantics), never fail-silent.
    fs.delete(probesPath, false): Unit
    if (!fs.rename(tmp, probesPath))
      throw new java.io.IOException(s"probe sidecar swap failed: $tmp -> $probesPath")
    fs.delete(legacyProbesPath, false): Unit // superseded millis-unit sidecar
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

    // every fetched frame is materialized ONCE (eager localCheckpoint,
    // blocks self-release via the ContextCleaner): the emptiness probe
    // and the append then read the same materialization — the old
    // isEmpty-then-write shape ran the provider's plan twice per branch,
    // doubling the remote calls this cache layer exists to minimize
    var lastFetched: Option[DataFrame] = None
    if (missing.nonEmpty) {
      // guarded like the other branches: an UNGUARDED write of an empty
      // fetch on a cold cache created a dir holding only _SUCCESS (a
      // zero-row partitionBy write emits no parquet footer), and every
      // later read of the cache died on schema inference
      val got = fetch(missing, start, end).localCheckpoint(true)
      lastFetched = Some(got)
      if (!got.isEmpty) write(got)
    }
    if (headGap.nonEmpty) {
      headGap.foreach { t =>
        val lo = cov(t)._1
        val head = fetch(Seq(t), start, tsOfMicros(micros(lo) - 1))
          .localCheckpoint(true)
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
        .localCheckpoint(true)
      if (!delta.isEmpty) write(delta)
    }

    if (isEmpty)
      // nothing cached and nothing fetched worth writing: answer with a
      // schema-bearing EMPTY frame (the fetch result's shape) instead of
      // pointing the reader at a nonexistent path
      return lastFetched.map(_.limit(0)).getOrElse(spark.emptyDataFrame)
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
    val probes = loadProbes()
    val rows = tickers.sorted.map { t =>
      cov.get(t) match {
        case None => (t, None: Option[java.sql.Timestamp],
          None: Option[java.sql.Timestamp], "miss")
        case Some((lo, hi)) =>
          // the head leg consults the probe marks EXACTLY as read()'s
          // routing does: a head range already probed is settled — read()
          // will never fetch it, so reporting it head_gap forever told a
          // monitor the cache was permanently broken when it wasn't
          val headOpen = lo.after(start) &&
            probes.get(t).forall(_ > micros(start))
          val status = (headOpen, hi.before(end)) match {
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
    val probes = loadProbes()
    // probe-settled heads count as covered, matching read()'s routing
    def headOpen(t: String, lo: java.sql.Timestamp) =
      lo.after(start) && probes.get(t).forall(_ > micros(start))
    val full = tickers.count(t => cov.get(t).exists { case (lo, hi) =>
      !headOpen(t, lo) && !hi.before(end) })
    // partial = cached but not covering (open head gap, stale tail, both)
    val partial = tickers.count(t => cov.get(t).exists { case (lo, hi) =>
      headOpen(t, lo) || hi.before(end) })
    (full, partial, tickers.size - full - partial)
  }
}
