package graft.forecast

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.domain.ForecastPayload

/** Model snapshot store + order learner — rebuilds of /root/reference/
  * forcester_ts/model_snapshot_store.py (fit results keyed by a hash of
  * (ticker, series, config) so unchanged inputs skip refits,
  * forecaster.py:695-811) and forcester_ts/order_learner.py (warm-start
  * cache of the best AR order per ticker so grids shrink,
  * garch.py:247-270 / sarimax.py:708+).
  *
  * Both are small keyed parquet tables joined/broadcast against work —
  * the Spark-native form of the reference's pickle caches.
  */
final class SnapshotStore(spark: SparkSession, dir: String) {
  import spark.implicits._

  private val path = s"$dir/forecast_snapshots"

  /** Deterministic content key of a fit request. */
  def key(ticker: String, prices: Array[Double], configHash: String): String =
    SnapshotStore.contentKey(ticker, prices, configHash)

  def lookup(k: String): Option[Seq[ForecastPayload]] = {
    if (!Files.exists(Paths.get(path))) return None
    val hit = spark.read.parquet(path).where(col("snapKey") === k)
    if (hit.isEmpty) None
    else Some(hit.drop("snapKey").as[ForecastPayload].collect().toSeq)
  }

  def save(k: String, payloads: Seq[ForecastPayload]): Unit =
    payloads.toDS().withColumn("snapKey", lit(k))
      .write.mode("append").parquet(path)

  /** Fit-through-cache: returns cached payloads when the key matches,
    * otherwise computes, stores, and returns. */
  def fitOrRestore(ticker: String, prices: Array[Double], configHash: String)(
      fit: => Seq[ForecastPayload]): (Seq[ForecastPayload], Boolean) = {
    val k = key(ticker, prices, configHash)
    lookup(k) match {
      case Some(cached) => (cached, true)
      case None =>
        val computed = fit
        if (computed.nonEmpty) save(k, computed)
        (computed, false)
    }
  }
}

object SnapshotStore {
  /** Deterministic content key of a fit request — static so executor-side
    * kernels (ForecastCache) can compute it without a session. */
  def contentKey(ticker: String, prices: Array[Double], configHash: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(ticker.getBytes)
    prices.foreach(p => md.update(java.lang.Long.toHexString(
      java.lang.Double.doubleToLongBits(p)).getBytes))
    md.update(configHash.getBytes)
    md.digest().map("%02x".format(_)).mkString.take(32)
  }
}

/** Warm-start order cache: best (p, d) per (ticker, regime). */
final class OrderLearner(spark: SparkSession, dir: String) {
  private val path = s"$dir/order_cache"

  def record(ticker: String, regime: String, p: Int, d: Int, aic: Double): Unit = {
    import spark.implicits._
    Seq((ticker, regime, p, d, aic, System.currentTimeMillis()))
      .toDF("ticker", "regime", "p", "d", "aic", "ts")
      .write.mode("append").parquet(path)
  }

  /** Latest best order for the key, if any. */
  def suggest(ticker: String, regime: String): Option[(Int, Int)] = {
    if (!Files.exists(Paths.get(path))) return None
    val rows = spark.read.parquet(path)
      .where(col("ticker") === ticker && col("regime") === regime)
      .orderBy(desc("ts")).limit(1).collect()
    rows.headOption.map(r => (r.getAs[Int]("p"), r.getAs[Int]("d")))
  }

  /** Grid can be skipped when a suggestion exists (reference
    * should_skip_grid semantics). */
  def shouldSkipGrid(ticker: String, regime: String): Boolean =
    suggest(ticker, regime).isDefined
}
