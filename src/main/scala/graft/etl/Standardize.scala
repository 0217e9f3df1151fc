package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Provider-column standardizer — rebuild of the reference's
  * `_standardize_columns` (/root/reference/etl/base_extractor.py:203-257):
  * arbitrary provider spellings → canonical lowercase schema, ticker
  * normalized upper/trim (etl/preprocessor.py:20), required-column check
  * (etl/base_extractor.py:258-271). Pure projection — no shuffle.
  */
object Standardize {

  val required: Seq[String] = Seq("ticker", "date", "open", "high", "low", "close", "volume")

  private val aliases: Map[String, String] = Map(
    "symbol" -> "ticker", "tick" -> "ticker",
    "datetime" -> "date", "timestamp" -> "date", "time" -> "date",
    "o" -> "open", "h" -> "high", "l" -> "low", "c" -> "close",
    "adj close" -> "adj_close", "adjclose" -> "adj_close", "adjusted_close" -> "adj_close",
    "vol" -> "volume", "v" -> "volume")

  def apply(df: DataFrame): DataFrame = {
    val renamed = df.columns.foldLeft(df) { (acc, c) =>
      val canon = aliases.getOrElse(c.toLowerCase.trim, c.toLowerCase.trim)
      acc.withColumnRenamed(c, canon)
    }
    val missing = required.filterNot(renamed.columns.map(_.toLowerCase).contains)
    require(missing.isEmpty, s"missing required columns after standardization: $missing")
    renamed.withColumn("ticker", upper(trim(col("ticker"))))
  }
}
