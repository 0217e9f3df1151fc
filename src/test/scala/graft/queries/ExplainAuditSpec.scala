package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tools.ExplainAudit

class ExplainAuditSpec extends AnyFunSuite with TestSpark {

  private val dir = "/root/testdata/sf0.001"

  test("windows audit catches a deliberately-unpartitioned window over a fact") {
    val s = spark
    import s.implicits._
    val fact = graft.Tables.load(s, dir, "documents")
    val broken = fact.withColumn("cum",
      sum(length($"text")).over(Window.orderBy($"doc_id")))
    val v = ExplainAudit.unpartitionedWindowViolations(
      broken.queryExecution.sparkPlan)
    assert(v.nonEmpty, "control plan must be flagged")

    // and the same window is FINE once the frame is provably reduced
    // (aggregate beneath) — the q109 shape
    val dim = fact.groupBy($"lang").agg(count(lit(1)).as("n"))
      .withColumn("cum", sum($"n").over(Window.orderBy($"lang")))
    assert(ExplainAudit.unpartitionedWindowViolations(
      dim.queryExecution.sparkPlan).isEmpty)
  }

  test("windows audit: every engine query plan is clean") {
    val s = spark
    // plan-level sweep over the full query surface: the two known
    // unpartitioned windows (macro as-of lead — broadcast output;
    // q109 cumulative equity — aggregate input) must carry their dim
    // evidence, and nothing else may introduce an unpartitioned window
    val bad = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        ExplainAudit.unpartitionedWindowViolations(
          fn(s, dir).queryExecution.sparkPlan).map(v => s"$name: $v")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
