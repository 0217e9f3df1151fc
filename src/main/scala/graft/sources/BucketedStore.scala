package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table helpers — the co-located-join leg of the 100 TB
  * design: two fact tables bucketed (and sorted) the same way on their
  * join key join WITHOUT any Exchange, because each bucket pair is
  * already co-partitioned on disk. This is the storage-layout answer to
  * the reference's single-process joins (SQLite nested loops,
  * /root/reference/etl/database_manager.py views): at cluster scale the
  * shuffle, not the join, is the cost — bucketing pays it ONCE at write
  * time and amortizes it over every subsequent join/aggregation on the
  * key.
  *
  * Spark bucketing requires the table catalog (`saveAsTable`) — bucket
  * metadata lives in the metastore, not in parquet footers.
  */
object BucketedStore {

  /** Write `df` as a bucketed+sorted managed table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keyCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts Spark plans a SortMergeJoin whose BOTH sides read
    * bucketed scans — zero Exchange operators (assert via
    * [[isShuffleFree]]). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      keyCols: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keyCols)

  /** True when the physical plan contains no SHUFFLE exchange
    * (BroadcastExchange moves a dim, not the fact table — it does not
    * count as a shuffle of the data). */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    "(?<![A-Za-z])Exchange".r.findFirstIn(plan).isEmpty
  }
}
