package graft.forecast

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Walk-forward / rolling-origin validation — rebuild of /root/reference/
  * forcester_ts/walk_forward_learner.py:81-398 and cross_validation.py:
  * 30-151: expanding (or rolling) folds over each ticker's series, a
  * fit→forecast→score cycle per fold, and per-model aggregate metrics.
  *
  * Spark shape: fold specs × tickers are exploded into independent
  * (ticker, fold) kernel tasks — fold-parallel AND ticker-parallel, no
  * driver loop (the reference iterates folds sequentially in-process).
  */
object WalkForward {

  final case class FoldMetric(ticker: String, foldId: Int, model: String,
      rmse: Double, da: Double, nTest: Int)

  final case class Summary(model: String, meanRmse: Double, stdRmse: Double,
      meanDa: Double, nFolds: Long)

  /** Expanding walk-forward: k folds, each training on the prefix and
    * forecasting the next `horizon` bars. `forecaster` plugs the
    * per-fold kernel (defaults to the full engine); q151 passes the
    * AR-OLS kernel so the REAL fold orchestration runs under the hash
    * gate with a SQL-replayable forecaster. */
  def run(bars: DataFrame, k: Int = 4, horizon: Int = 5,
      cfg: ForecastEngine.Config = ForecastEngine.Config(),
      forecaster: (String, Array[Double], ForecastEngine.Config) =>
        Seq[ForecastEngine.TickerForecast] = ForecastEngine.forecastOne)
      : Dataset[FoldMetric] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars.select(col("ticker"), col("date").cast("long").as("epoch"), col("close"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (ticker, rows) =>
        val prices = rows.toArray.sortBy(_._2).map(_._3)
        val n = prices.length
        val usable = n - horizon * k
        if (usable < 60) Iterator.empty
        else (1 to k).iterator.flatMap { f =>
          val trainEnd = usable + (f - 1) * horizon
          val train = prices.take(trainEnd)
          val actual = prices.slice(trainEnd, trainEnd + horizon)
          val fcCfg = cfg.copy(horizon = horizon)
          forecaster(ticker, train, fcCfg)
            .groupBy(_.model).map { case (model, rws) =>
              val pred = rws.filter(_.weight >= 0).sortBy(_.horizonStep)
                .map(_.forecast).take(actual.length).toArray
              val rmse = math.sqrt(pred.zip(actual)
                .map { case (p, a) => (p - a) * (p - a) }.sum / actual.length)
              val da = pred.zip(actual).zipWithIndex.count { case ((p, a), i) =>
                val prev = if (i == 0) train.last else actual(i - 1)
                math.signum(p - prev) == math.signum(a - prev)
              }.toDouble / actual.length
              FoldMetric(ticker, f, model, rmse, da, actual.length)
            }
        }
      }
  }

  /** [[run]] through a [[ForecastCache]]: each fold's per-ticker train
    * prefix resolves via the snapshot store (reruns on unchanged data
    * skip every fit), and orders learned in earlier folds warm-start the
    * AR grids of later folds — the NOTES "fit-skip across walk-forward"
    * wiring. The k-iteration driver loop is over FOLDS (k is small);
    * within a fold everything is one distributed job. Returns the fold
    * metrics plus the aggregate hit/miss tally (fit-skip rate =
    * hits / (hits + misses)).
    */
  def runCached(bars: DataFrame, cache: ForecastCache, k: Int = 4,
      horizon: Int = 5, cfg: ForecastEngine.Config = ForecastEngine.Config())
      : (Dataset[FoldMetric], (Long, Long)) = {
    val spark = bars.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val wT = Window.partitionBy(col("ticker")).orderBy(col("epoch"))
    val ranked = bars
      .select(col("ticker"), col("date").cast("long").as("epoch"), col("close"))
      .withColumn("rn", row_number().over(wT))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("ticker"))))
      .withColumn("usable", col("n") - lit(horizon * k))
      .where(col("usable") >= 60)
      .cache()

    var hits = 0L
    var misses = 0L
    val folds = (1 to k).map { f =>
      val trainEnd = col("usable") + lit((f - 1) * horizon)
      val train = ranked.where(col("rn") <= trainEnd)
        .select(col("ticker"), col("epoch").as("date"), col("close"))
      val (fc, st) = cache.fitForecast(train, cfg.copy(horizon = horizon))
      hits += st.hits; misses += st.misses
      // actuals for this fold: h = rn - trainEnd in 1..horizon; prev(h)
      // = actual(h-1), with prev(1) = last train price
      val actuals = ranked
        .where(col("rn") > trainEnd && col("rn") <= trainEnd + horizon)
        .select(col("ticker"), (col("rn") - trainEnd).cast("int").as("h"),
          col("close").as("a"))
      val lastTrain = ranked.where(col("rn") === trainEnd)
        .select(col("ticker"), lit(1).as("h"), col("close").as("prev"))
      val prevs = actuals.select(col("ticker"), (col("h") + 1).as("h"),
          col("a").as("prev"))
        .union(lastTrain)
      fc.toDF()
        .select(col("ticker"), col("model"), col("horizonStep").as("h"),
          col("forecast").as("p"))
        .join(actuals, Seq("ticker", "h"))
        .join(prevs, Seq("ticker", "h"))
        .groupBy(col("ticker"), col("model")).agg(
          sqrt(avg((col("p") - col("a")) * (col("p") - col("a")))).as("rmse"),
          avg(when(signum(col("p") - col("prev")) === signum(col("a") - col("prev")),
            1.0).otherwise(0.0)).as("da"),
          count(lit(1)).cast("int").as("nTest"))
        .withColumn("foldId", lit(f))
    }
    val out = folds.reduce(_ unionByName _)
      .select(col("ticker"), col("foldId"), col("model"), col("rmse"),
        col("da"), col("nTest"))
      .as[FoldMetric]
    ranked.unpersist()
    (out, (hits, misses))
  }

  /** Per-model aggregates across folds and tickers. */
  def summarize(metrics: Dataset[FoldMetric]): Dataset[Summary] = {
    val spark = metrics.sparkSession
    import spark.implicits._
    metrics.groupBy(col("model")).agg(
        avg(col("rmse")).as("meanRmse"),
        coalesce(stddev_samp(col("rmse")), lit(0.0)).as("stdRmse"),
        avg(col("da")).as("meanDa"),
        count(lit(1)).as("nFolds"))
      .as[Summary]
  }
}
