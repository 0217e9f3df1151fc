package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chronological train/val/test split + expanding/rolling k-fold CV —
  * rebuild of /root/reference/etl/data_storage.py:179-439 and
  * etl/time_series_cv.py:55-322.
  *
  * Semantics preserved from the reference:
  *  - splits are by UNIQUE DATE, not by row, so multi-ticker frames never
  *    let one ticker's rows straddle a boundary (data_storage.py:246-330);
  *  - the final test fraction is isolated from CV folds
  *    (time_series_cv.py:108-117);
  *  - expanding folds grow the train window, rolling folds slide it;
  *    an optional gap of g dates separates train from validation.
  *
  * Scale design: rows are TAGGED with split/fold columns, never
  * materialized into per-split copies — one `when` chain against
  * broadcast cut-points. Cut-points come from the sorted distinct-date
  * dimension (tiny: one row per trading day, ~250/yr even for a 100 TB
  * bar table), so collecting it to the driver is safe at any scale.
  */
object Splitter {

  /** Distinct sorted dates of the frame — the split dimension. This is a
    * driver collect by design: the date dimension of a bar table is tiny
    * (decades of daily bars < 20k rows) regardless of how many tickers ×
    * rows the fact side has. The bound is probed with a LIMIT count
    * BEFORE collecting — a guard after the collect couldn't save the
    * driver from the oversized collect it exists to prevent. Shared by
    * [[chronological]]/[[cvFolds]] and pipeline.AutoTrader. */
  private[graft] def distinctDates(df: DataFrame,
      dateCol: String = "date"): Array[java.sql.Timestamp] = {
    // cast("timestamp") tolerates a TIMESTAMP_NTZ date column (drifting
    // testdata parquet) — rows then always carry java.sql.Timestamp.
    val distinctDs = df.select(col(dateCol).cast("timestamp").as("date")).distinct()
    val probe = distinctDs.limit(1000001).count()
    require(probe <= 1000000,
      s"date dimension unexpectedly large (>$probe rows) — not a bar-frequency table")
    distinctDs.orderBy(col("date")).collect().map(_.getTimestamp(0))
  }

  private def dates(df: DataFrame): Array[java.sql.Timestamp] = distinctDates(df)

  /** Tag each row train/validation/testing by unique-date fractions. */
  def chronological(
      df: DataFrame,
      trainFrac: Double = 0.70,
      valFrac: Double = 0.15): DataFrame = {
    val ds = dates(df)
    require(ds.length >= 3, s"need >=3 distinct dates, got ${ds.length}")
    val nTrain = math.max(1, math.round(ds.length * trainFrac).toInt)
    val nVal = math.max(1, math.round(ds.length * valFrac).toInt)
    val trainEnd = ds(math.min(nTrain, ds.length - 2) - 1)
    val valEnd = ds(math.min(nTrain + nVal, ds.length - 1) - 1)
    df.withColumn("split",
      when(col("date") <= lit(trainEnd), "training")
        .when(col("date") <= lit(valEnd), "validation")
        .otherwise("testing"))
  }

  final case class FoldSpec(foldId: Int, trainStart: java.sql.Timestamp,
      trainEnd: java.sql.Timestamp, valStart: java.sql.Timestamp,
      valEnd: java.sql.Timestamp)

  /** Expanding (or rolling) k-fold specs over the non-test prefix.
    * fold_size = cvDates/(k+1) as in time_series_cv.py:55-150. */
  def cvFolds(
      df: DataFrame,
      k: Int,
      testFrac: Double = 0.15,
      expanding: Boolean = true,
      gap: Int = 0): Seq[FoldSpec] = {
    val ds = dates(df)
    val nTest = math.round(ds.length * testFrac).toInt
    val cv = ds.take(ds.length - nTest)
    val foldSize = cv.length / (k + 1)
    require(foldSize > gap, s"fold size $foldSize must exceed gap $gap")
    (1 to k).map { f =>
      val valStart = f * foldSize
      val valEnd = math.min(valStart + foldSize, cv.length) - 1
      val trainStart = if (expanding) 0 else (f - 1) * foldSize
      FoldSpec(f, cv(trainStart), cv(valStart - gap - 1), cv(valStart), cv(valEnd))
    }
  }

  /** Tag rows with (fold_id, role) — one output row per (row, fold) via a
    * broadcast-joined fold dimension; still no materialized copies. */
  def tagFolds(df: DataFrame, folds: Seq[FoldSpec]): DataFrame = {
    val specs = folds.map(f =>
      (f.foldId, f.trainStart, f.trainEnd, f.valStart, f.valEnd))
    val spark = df.sparkSession
    import spark.implicits._
    val dim = specs.toDF("fold_id", "train_start", "train_end", "val_start", "val_end")
    df.join(broadcast(dim),
        col("date").between(col("train_start"), col("train_end")) ||
          col("date").between(col("val_start"), col("val_end")))
      .withColumn("role",
        when(col("date") <= col("train_end"), "train").otherwise("validation"))
      .drop("train_start", "train_end", "val_start", "val_end")
  }
}
