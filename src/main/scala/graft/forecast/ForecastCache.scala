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
final class ForecastCache(spark: SparkSession, dir: String) {
  import spark.implicits._

  private val rowsPath = s"$dir/forecast_rows"
  private val orderPath = s"$dir/order_cache"

  final case class Stats(hits: Long, misses: Long)

  private def storeDf: Option[DataFrame] =
    if (Files.exists(Paths.get(rowsPath))) Some(spark.read.parquet(rowsPath))
    else None

  /** Latest learned (p, d) per (ticker, regime) — broadcast into the
    * miss kernel as warm starts. Same table OrderLearner reads. */
  def warmStarts(): Map[(String, String), (Int, Int)] = {
    if (!Files.exists(Paths.get(orderPath))) return Map.empty
    spark.read.parquet(orderPath)
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
    val keysDf = prep.select("snapKey").distinct().cache()
    val storedKeysDf = storeDf
      .map(_.select("snapKey").distinct())
      .getOrElse(spark.emptyDataset[String].toDF("snapKey"))
    val nKeys = keysDf.count()
    val hits = keysDf.join(storedKeysDf, "snapKey").count()
    val misses = nKeys - hits

    if (misses > 0) {
      val warm = spark.sparkContext.broadcast(warmStarts())
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

    val out = spark.read.parquet(rowsPath)
      .join(broadcast(keysDf), "snapKey")
      // concurrent appends could double-store a key; keep one copy
      .dropDuplicates("snapKey", "ticker", "model", "horizonStep")
      .drop("snapKey")
      .as[TickerForecast]
    prep.unpersist()
    (out, Stats(hits = hits, misses = misses))
  }
}
