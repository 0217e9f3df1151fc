package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.PrefixDiffSumRule

/** Measured evidence for [[graft.plans.PrefixDiffSumRule]]: the same
  * wide sliding decimal sum, rule off vs on, on a synthetic frame big
  * enough for the O(frame)/row re-aggregation to dominate. Prints one
  * line: `{"rows":R,"span":K,"sliding_sec":a,"prefix_sec":b,"speedup":x,
  * "equal":true}`.
  *
  * Usage: `runMain graft.tools.PrefixDiffDemo [rows-per-ticker] [span]`
  * (defaults 200000 and 500).
  */
object PrefixDiffDemo {
  def main(args: Array[String]): Unit = {
    val rowsPerTicker = if (args.length > 0) args(0).toInt else 200000
    val span = if (args.length > 1) args(1).toInt else 500
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = spark.range(0, rowsPerTicker * 4L)
      .select((col("id") % 4).cast("string").as("ticker"),
        (col("id") / 4).cast("long").as("i"),
        when(col("id") % 13 === 0, lit(null))
          .otherwise((col("id") % 997).cast("decimal(20,4)") / 16).as("d"))
      .cache()
    base.count()

    // built FRESH per run: re-collecting one DataFrame re-uses its
    // shuffle map outputs and skips the whole window stage, so a reused
    // plan times the scheduler, not the frame evaluation
    def q = base.withColumn("s",
      sum(col("d")).over(
        Window.partitionBy("ticker").orderBy("i").rowsBetween(-(span - 1), 0)))
      .agg(count(col("s")), max(col("s")))

    def time(): (Double, Seq[Any]) = {
      val t0 = System.nanoTime()
      val r = q.collect().head.toSeq
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // interleaved reps, min-of-2 per arm, so JVM warm-up can't be
    // mistaken for the rewrite's win
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PrefixDiffSumRule
    def arm(enabled: Boolean): (Double, Seq[Any]) = {
      spark.conf.set("spark.graft.prefixDiffSum.enabled", enabled.toString)
      time()
    }
    val runs = Seq(arm(false), arm(true), arm(false), arm(true))
    val (slidingSec, slidingRes) = Seq(runs(0), runs(2)).minBy(_._1)
    val (prefixSec, prefixRes) = Seq(runs(1), runs(3)).minBy(_._1)

    println(f"""{"rows":${rowsPerTicker * 4L},"span":$span,""" +
      f""""sliding_sec":$slidingSec%.2f,"prefix_sec":$prefixSec%.2f,""" +
      f""""speedup":${slidingSec / prefixSec}%.1f,"equal":${slidingRes == prefixRes}}""")
    spark.stop()
  }
}
