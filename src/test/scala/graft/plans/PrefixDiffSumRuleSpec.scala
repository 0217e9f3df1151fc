package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{CurrentRow, Literal, RowFrame, SpecifiedWindowFrame, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PrefixDiffSumRuleSpec extends AnyFunSuite with TestSpark {

  private def withRule[T](enabled: Boolean)(body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ PrefixDiffSumRule
    spark.conf.set("spark.graft.prefixDiffSum.enabled", enabled.toString)
    try body
    finally {
      spark.conf.unset("spark.graft.prefixDiffSum.enabled")
      spark.experimental.extraOptimizations = prev
    }
  }

  /** Null-laden fixture: per-ticker sequences with scattered nulls, an
    * all-null stretch WIDER than the frame (the count-guard case), and
    * non-null tails — partition heads exercise the empty-past-frame
    * coalesce. */
  private def fixture(): DataFrame = {
    val s = spark; import s.implicits._
    (for {
      t <- Seq("A", "B", "C")
      i <- 0 until 300
    } yield {
      val v: java.lang.Double =
        if (i % 7 == 0 || (i >= 100 && i < 190)) null
        else (i * 3 + t.hashCode % 11).toDouble / 16.0
      (t, i, v)
    }).toDF("ticker", "i", "v")
  }

  /** Count wide sliding Sum frames in the OPTIMIZED plan. */
  private def wideSlidingSums(df: DataFrame, span: Int): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.windowExpressions.count(_.collectFirst {
          case WindowExpression(AggregateExpression(_: Sum, _, _, _, _),
              WindowSpecDefinition(_, _,
                SpecifiedWindowFrame(RowFrame, Literal(l: Int, _), CurrentRow)))
            if l < 0 && -l + 1 >= span => ()
        }.isDefined)
    }.sum

  private val w60 = Window.partitionBy("ticker").orderBy("i").rowsBetween(-59, 0)

  test("decimal sliding sum: rewritten plan is bit-identical on a null-laden fixture") {
    val base = fixture().withColumn("d", col("v").cast("decimal(20,4)"))
    def query(df: DataFrame) = df
      .withColumn("s60", sum(col("d")).over(w60))
      .select("ticker", "i", "s60")
    val expected = query(base).collect().toSeq // rule not registered
    val (got, slides) = withRule(enabled = true) {
      val q = query(base)
      (q.collect().toSeq, wideSlidingSums(q, 40))
    }
    assert(slides === 0, "wide sliding Sum survived the rewrite")
    assert(got.sortBy(r => (r.getString(0), r.getInt(1)))
      === expected.sortBy(r => (r.getString(0), r.getInt(1))))
  }

  test("long sliding sum: rewritten plan is bit-identical, including all-null frames") {
    val base = fixture()
      .withColumn("l", (col("v") * 16).cast("long"))
    def query(df: DataFrame) = df
      .withColumn("s60", sum(col("l")).over(w60))
      .select("ticker", "i", "s60")
    val expected = query(base).collect().toSeq
    val (got, slides) = withRule(enabled = true) {
      val q = query(base)
      (q.collect().toSeq, wideSlidingSums(q, 40))
    }
    assert(slides === 0)
    assert(got.sortBy(r => (r.getString(0), r.getInt(1)))
      === expected.sortBy(r => (r.getString(0), r.getInt(1))))
    // the all-null stretch must surface as NULLs, not prefix-diff zeros
    val nullRows = got.filter(r => r.getInt(1) >= 166 && r.getInt(1) < 190)
    assert(nullRows.nonEmpty && nullRows.forall(_.isNullAt(2)))
  }

  test("ineligible shapes are untouched: doubles, narrow frames, range frames, disabled flag") {
    val base = fixture().withColumn("d", col("v").cast("decimal(20,4)"))
    val rangeQ = (df: DataFrame) => df.withColumn("s",
      sum(col("i").cast("long")).over(
        Window.partitionBy("ticker").orderBy("i").rangeBetween(-59, 0)))
      .select("ticker", "i", "s")
    val rangeExpected = rangeQ(base).collect().toSeq
    withRule(enabled = true) {
      // double input: float prefix differences cancel — must stay sliding
      val dbl = base.withColumn("s", sum(col("v")).over(w60))
      assert(wideSlidingSums(dbl, 40) === 1)
      // narrow frame: below minSpan
      val narrow = base.withColumn("s", sum(col("d"))
        .over(Window.partitionBy("ticker").orderBy("i").rowsBetween(-9, 0)))
      assert(wideSlidingSums(narrow, 10) === 1)
      // RANGE frames have no fixed row span — must stay untouched and
      // still evaluate identically under the rule. (DISTINCT/FILTER
      // window aggregates never reach the optimizer: Spark's analyzer
      // rejects them, so the structural guard in the pattern is
      // unreachable belt-and-braces.)
      assert(rangeQ(base).collect().toSeq
        .sortBy(r => (r.getString(0), r.getInt(1)))
        === rangeExpected.sortBy(r => (r.getString(0), r.getInt(1))))
    }
    withRule(enabled = false) {
      val off = base.withColumn("s", sum(col("d")).over(w60))
      assert(wideSlidingSums(off, 40) === 1, "rule must be opt-in")
    }
  }

  test("mixed window: ineligible expressions stay, output schema and order preserved") {
    val base = fixture().withColumn("d", col("v").cast("decimal(20,4)"))
    def query(df: DataFrame) = df.select(
      col("ticker"), col("i"),
      sum(col("d")).over(w60).as("s60"),
      avg(col("v")).over(w60).as("m60"),
      lag(col("v"), 1).over(Window.partitionBy("ticker").orderBy("i")).as("pv"))
    val expected = query(base).collect().toSeq
    val got = withRule(enabled = true) {
      val q = query(base)
      assert(q.columns.toSeq === Seq("ticker", "i", "s60", "m60", "pv"))
      assert(wideSlidingSums(q, 40) === 0)
      q.collect().toSeq
    }
    assert(got.sortBy(r => (r.getString(0), r.getInt(1)))
      === expected.sortBy(r => (r.getString(0), r.getInt(1))))
  }
}
