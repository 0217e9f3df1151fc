package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish testdata (see TESTDATA.md).
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet file each under the sf dir.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    // default. Read nanos as long and integer-divide to micros — exactly
    // the truncation DuckDB applies when it reads the same file into its
    // microsecond TIMESTAMP, so oracle comparisons agree.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val shimmed =
      if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else df
    normalizeTimestamps(shimmed)
  }

  /** Canonicalize TIMESTAMP_NTZ columns to TIMESTAMP. The driver's testdata
    * has flipped between TIMESTAMP(NANOS) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false); the latter makes Spark 4 infer TimestampNTZType,
    * which `unix_micros` and `Row.getTimestamp` both reject. The session runs
    * in UTC, so the cast is value-preserving and matches how DuckDB reads the
    * same naive file into its microsecond TIMESTAMP — oracle hashes agree. */
  private def normalizeTimestamps(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.TimestampNTZType
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType).map(_.name)
    ntz.foldLeft(df)((d, c) =>
      d.withColumn(c, org.apache.spark.sql.functions.col(c).cast("timestamp")))
  }

  /** Register every testdata table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
