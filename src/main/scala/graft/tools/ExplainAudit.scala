package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev main: dump the interesting physical-plan lines (scans, pushed
  * filters, read schemas, joins, exchanges) for a set of queries so
  * pushdown/broadcast regressions are visible at a glance. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val qs = if (args.nonEmpty) args.toSeq else Seq(
      "q2_filter_range", "q3_topk", "q4_join_inner", "q30_asof_join",
      "q50_dedup_exact", "q61_dedup_gate")
    for (q <- qs) {
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, dir).queryExecution
        .explainString(FormattedMode).split("\n")
        .filter(l => l.contains("Scan parquet") || l.contains("PushedFilters") ||
          l.contains("ReadSchema") || l.contains("Join") || l.contains("Exchange") ||
          l.contains("WholeStageCodegen"))
        .take(24).foreach(println)
    }
    spark.stop()
  }
}
