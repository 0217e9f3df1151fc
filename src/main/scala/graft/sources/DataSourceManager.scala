package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-provider source registry with a priority-ordered failover chain —
  * rebuild of /root/reference/etl/data_source_manager.py:32-508: providers
  * are tried in priority order, a provider that throws OR returns an empty
  * frame fails over to the next (:389-437), and every extracted frame is
  * tagged with its provenance (:175-186 — a real `source` COLUMN here, not
  * frame attrs, per SURVEY §1.2).
  *
  * The reference's ticker-chunked extraction (:343-388) is intentionally
  * absent: partitioning makes memory-bounding chunks obsolete (SURVEY §4).
  */
object DataSourceManager {

  trait Source {
    def name: String
    def extract(tickers: Seq[String],
        start: java.sql.Timestamp, end: java.sql.Timestamp): DataFrame
  }

  final case class ExtractionResult(df: DataFrame, provider: String,
      failedProviders: Seq[String])

  final class FailoverChain(providers: Seq[Source]) {
    require(providers.nonEmpty, "no providers registered")

    def extract(tickers: Seq[String], start: java.sql.Timestamp,
        end: java.sql.Timestamp): ExtractionResult = {
      val failed = scala.collection.mutable.ArrayBuffer.empty[String]
      providers.foreach { p =>
        try {
          // materialize the candidate ONCE (eager localCheckpoint;
          // blocks self-release when the frame is no longer referenced):
          // the old isEmpty-probe-then-return re-executed the winning
          // provider's plan on every downstream action — double the
          // provider I/O, and for a non-deterministic provider the rows
          // acted on could differ from the ones the emptiness gate and
          // provenance decision were based on
          val df = p.extract(tickers, start, end).localCheckpoint(true)
          if (!df.isEmpty)
            return ExtractionResult(
              df.withColumn("source", lit(p.name)), p.name, failed.toSeq)
          failed += s"${p.name}:empty"
        } catch {
          case e: Exception => failed += s"${p.name}:${e.getClass.getSimpleName}"
        }
      }
      throw new IllegalStateException(
        s"all providers failed for $tickers: ${failed.mkString(", ")}")
    }
  }

  /** The synthetic generator as the terminal fallback provider
    * (run_etl_pipeline.py:324-366 GBM fallback, provenance-tagged). */
  def syntheticFallback(spark: org.apache.spark.sql.SparkSession,
      nBars: Int = 120, seed: Long = 42L): Source = new Source {
    val name = "synthetic"
    def extract(tickers: Seq[String], start: java.sql.Timestamp,
        end: java.sql.Timestamp): DataFrame = {
      // the generator stamps bars at the DAY floor, so the filter's
      // lower bound is clamped to start's own day: an intraday window
      // (start 09:00, end 17:00 same day) otherwise excluded every bar
      // and the TERMINAL always-available fallback reported empty,
      // failing the whole chain
      val dayFloor = java.sql.Timestamp.valueOf(
        start.toLocalDateTime.toLocalDate.atStartOfDay)
      SyntheticSource.generate(spark, tickers, nBars,
          start.toLocalDateTime.toLocalDate, seed).toDF()
        .where(col("date").between(dayFloor, end))
    }
  }
}
