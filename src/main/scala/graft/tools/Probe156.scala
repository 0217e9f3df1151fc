package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: where does q156's time go at sf0.1? */
object Probe156 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val input = graft.Tables.load(spark, dir, "events")
      .where(col("value") =!= 0)
      .groupBy($"event_type".as("ticker"),
        date_trunc("second", $"ts").as("date"))
      .agg(graft.queries.Det.davg($"value").as("close"),
        max($"value").as("high"), min($"value").as("low"))

    time("input agg count")(println("rows=" + input.count()))
    val cached = input.cache()
    cached.count()
    for (_ <- 1 to 2) {
      time("build(dropNa=true) cvar") {
        graft.features.FeatureBuilder.build(cached, dropNa = true)
          .select($"ticker", $"date", $"cvar_95_60")
          .write.mode("overwrite").parquet("/tmp/probe156")
      }
    }
    time("health(build(dropNa=false))") {
      graft.features.FeatureBuilder.health(
        graft.features.FeatureBuilder.build(cached, dropNa = false))
        .write.mode("overwrite").parquet("/tmp/probe158")
    }
    spark.stop()
  }
}
