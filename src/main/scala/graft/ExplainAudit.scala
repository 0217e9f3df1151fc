package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries and greps
  * them for the properties that matter at 100 TB: parquet filter/column
  * pushdown, broadcast joins, whole-stage codegen coverage, and single
  * Window operators. Run per round; findings land in README.md.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // audit-only: AQE wraps the plan in AdaptiveSparkPlan before
      // execution, hiding codegen stars and subtree counts from every
      // explain mode — the production mains keep AQE on
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = if (args.length > 1) args.drop(1).toSeq
    else Seq("q2_filter_range", "q4_join_inner", "q11_win_rolling",
      "q30_asof_join", "q54_cosine_topk", "q1_agg",
      "q51_ngram_jaccard", "q87_ljung_box", "q89_hurst")
    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      // formatted mode under AQE shows no codegen stars before
      // execution — CodegenMode compiles the non-adaptive plan and
      // reports its WholeStageCodegen subtree count directly
      val codegen = df.queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
      val checks = Seq(
        "PushedFilters" -> plan.contains("PushedFilters: ["),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        "WholeStageCodegen" -> "Found [1-9][0-9]* WholeStageCodegen subtree".r
          .findFirstIn(codegen).isDefined,
        "SortMergeJoin" -> plan.contains("SortMergeJoin"))
      println(s"[audit] $name: " + checks.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
