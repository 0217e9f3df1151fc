package graft.forecast

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Dataset, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import ForecastEngine.TickerForecast

/** Distributed fit-through-cache for [[ForecastEngine]] — the Spark
  * shape of the reference's model snapshot store + order learner
  * (forcester_ts/model_snapshot_store.py, order_learner.py): unchanged
  * (ticker, series, config) inputs skip the whole per-ticker fit, and
  * learned AR orders warm-start the order grid on misses.
  *
  * Scale design: the cache is a snapKey-keyed parquet TABLE, not a
  * driver-side lookup — hits resolve via a broadcast join of this run's
  * (small, one-per-ticker) key set against the store, misses fit inside
  * the usual groupByKey kernel and append. Nothing iterates tickers on
  * the driver; walk-forward folds that re-present identical prefixes
  * become pure cache reads.
  */
object ForecastCache {
  /** Age after which a run's key files can no longer be referenced. */
  val runKeysTtlMs: Long = 60L * 60 * 1000
}

final class ForecastCache(spark: SparkSession, dir: String) {
  import spark.implicits._

  private val rowsPath = s"$dir/forecast_rows"
  private val orderPath = s"$dir/order_cache"

  final case class Stats(hits: Long, misses: Long)

  private def storeDf: Option[DataFrame] =
    if (Files.exists(Paths.get(rowsPath))) Some(spark.read.parquet(rowsPath))
    else None

  /** Drop run-key dirs old enough that no lazy Dataset from a prior
    * call can still be reading them (TTL, not delete-all: a recent
    * caller may not have consumed its output yet). */
  private def sweepRunKeys(): Unit = {
    val root = Paths.get(s"$dir/.run_keys")
    if (!Files.exists(root)) return
    val cutoff = System.currentTimeMillis() - ForecastCache.runKeysTtlMs
    val ls = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala
        .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
        .toSeq
        .foreach { p =>
          val walk = Files.walk(p)
          try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
          finally walk.close()
        }
    } finally ls.close()
  }

  /** Latest learned (p, d) per (ticker, regime) — broadcast into the
    * miss kernel as warm starts. Same table OrderLearner reads.
    * Unbounded (whole store); prefer [[warmStartsFor]] inside batch
    * paths so the driver-side map scales with the BATCH, not the store. */
  def warmStarts(): Map[(String, String), (Int, Int)] =
    warmStartsFor(None)

  /** Warm starts restricted (left-semi join) to the tickers of one
    * batch: the collected map is bounded by batch size × regimes even
    * when the order cache has accumulated millions of tickers. */
  def warmStartsFor(tickers: DataFrame): Map[(String, String), (Int, Int)] =
    warmStartsFor(Some(tickers))

  private def warmStartsFor(tickers: Option[DataFrame]): Map[(String, String), (Int, Int)] = {
    if (!Files.exists(Paths.get(orderPath))) return Map.empty
    val base = spark.read.parquet(orderPath)
    val bounded = tickers.fold(base) { t =>
      base.join(broadcast(t.select(col("ticker")).distinct()), Seq("ticker"), "left_semi")
    }
    bounded
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("ticker"), col("regime")).orderBy(desc("ts"))))
      .where(col("rn") === 1)
      .select(col("ticker"), col("regime"), col("p"), col("d"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getInt(2), r.getInt(3)))
      .toMap
  }

  /** [[ForecastEngine.fitForecast]] through the cache: identical output,
    * but tickers whose (series, config) snapKey is already stored are
    * read back instead of refit, and fresh fits append both forecast
    * rows and learned orders. */
  def fitForecast(bars: DataFrame, cfg: ForecastEngine.Config = ForecastEngine.Config())
      : (Dataset[TickerForecast], Stats) = {
    sweepRunKeys()
    val cfgHash = cfg.toString
    val prep = bars
      .select(col("ticker").as[String], col("date").cast("long").as[Long],
        col("close").as[Double])
      .groupByKey(_._1)
      .mapGroups { (ticker, rows) =>
        val prices = rows.toArray.sortBy(_._2).map(_._3)
        (ticker, prices, SnapshotStore.contentKey(ticker, prices, cfgHash))
      }
      .toDF("ticker", "prices", "snapKey")
      .cache()

    // hit/miss split via joins against the store's key column — no
    // driver-side key lists, so a million-ticker run stays distributed
    val keysDf = prep.select("snapKey").distinct()
    val storedKeysDf = storeDf
      .map(_.select("snapKey").distinct())
      .getOrElse(spark.emptyDataset[String].toDF("snapKey"))
    val nKeys = keysDf.count()
    val hits = keysDf.join(storedKeysDf, "snapKey").count()
    val misses = nKeys - hits

    if (misses > 0) {
      val warm = spark.sparkContext.broadcast(warmStartsFor(prep.select(col("ticker"))))
      val fitted = prep
        .join(storedKeysDf, Seq("snapKey"), "left_anti")
        .select(col("ticker").as[String], col("prices").as[Array[Double]],
          col("snapKey").as[String])
        .map { case (ticker, prices, snapKey) =>
          val regimeGuess = RegimeDetector.detect(prices).regime
          val detail = ForecastEngine.forecastOneDetailed(
            ticker, prices, cfg, warm.value.get((ticker, regimeGuess)))
          (snapKey, ticker, detail.regime, detail.p, detail.d, detail.aic,
            detail.rows)
        }
        .toDF("snapKey", "ticker", "regime", "p", "d", "aic", "rows")
        .cache()
      fitted
        .select(col("snapKey"), explode(col("rows")).as("r"))
        .select(col("snapKey"), col("r.*"))
        .write.mode("append").parquet(rowsPath)
      fitted
        .where(size(col("rows")) > 0)
        .select(col("ticker"), col("regime"), col("p"), col("d"), col("aic"),
          lit(System.currentTimeMillis()).as("ts"))
        .write.mode("append").parquet(orderPath)
      fitted.unpersist()
    }

    // Persist this run's key set next to the store, so the returned
    // (lazy) Dataset's lineage is parquet-only: every cache above can be
    // dropped NOW instead of leaking past the call. The tiny key files
    // are cleaned up eagerly by the next fitForecast on this cache dir.
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val keysPath = s"$dir/.run_keys/$runId"
    keysDf.write.parquet(keysPath)
    prep.unpersist()
    val out = spark.read.parquet(rowsPath)
      .join(broadcast(spark.read.parquet(keysPath)), "snapKey")
      // concurrent appends could double-store a key; keep one copy
      .dropDuplicates("snapKey", "ticker", "model", "horizonStep")
      .drop("snapKey")
      .as[TickerForecast]
    (out, Stats(hits = hits, misses = misses))
  }
}
