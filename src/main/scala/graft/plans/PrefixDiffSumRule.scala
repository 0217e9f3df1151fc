package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Optimizer rule: rewrite wide SLIDING exact-sum window frames into
  * prefix-difference form — the q154/q157 lesson as a Catalyst rule
  * instead of a hand rewrite.
  *
  * Spark evaluates a bounded sliding frame by RE-AGGREGATING the whole
  * frame for every row (`SlidingWindowFunctionFrame` has no retract
  * path), so `sum(x) OVER (ROWS BETWEEN k PRECEDING AND CURRENT ROW)`
  * costs O(k) adds per row. Both running-style frames are incremental
  * O(1)/row (`UnboundedPrecedingWindowFunctionFrame` only ever ADDS as
  * its bounded edge advances), and integer/decimal prefix sums are
  * EXACT, so
  *
  *   slide(i) = P(i) − P(i−k−1)   where P = running prefix sum
  *
  * holds bit-for-bit. The rewrite emits, inside the SAME Window node
  * (one shuffle, one sort, no new exchanges):
  *   P_cur  = sum(x)  ROWS (unbounded preceding, current row)
  *   P_past = sum(x)  ROWS (unbounded preceding, k+1 preceding)
  *   C_cur/C_past = count(x) over the same two frames
  * and projects `CASE WHEN C_cur − C_past > 0 THEN P_cur − coalesce(
  * P_past, 0) END` under the ORIGINAL output attribute id, preserving
  * null semantics exactly: an all-null (or empty-at-partition-head)
  * sliding frame yields NULL via the count guard, exactly as the
  * sliding sum would (sum skips nulls; an exact prefix difference over
  * an all-null span is 0, not NULL — the guard restores the NULL).
  *
  * Eligibility — deliberately narrow:
  *  - plain `Sum` (no DISTINCT, no FILTER) over a deterministic
  *    LongType or DecimalType input. DOUBLES ARE NEVER REWRITTEN:
  *    float prefix differences cancel catastrophically at the end of
  *    long prefixes, so only exact types preserve bit equality.
  *  - ROWS frame `(−k, CURRENT ROW)` with span k+1 ≥
  *    `spark.graft.prefixDiffSum.minSpan` (default 40, matching
  *    ExplainAudit's wide-sliding-frame gate) — narrow frames aren't
  *    worth the two extra running aggregates.
  *  - OFF by default (`spark.graft.prefixDiffSum.enabled`): a running
  *    sum accumulates the WHOLE partition, so it needs the headroom a
  *    sliding sum doesn't — same contract as Spark's own Sum over a
  *    whole-partition group (decimal sums carry +10 digits; longs are
  *    unchecked outside ANSI). Enable it for sessions whose value
  *    ranges are known, as this repo's hand-rewritten queries already
  *    prove theirs.
  *
  * Registered via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or
  * `spark.experimental.extraOptimizations`. Idempotent: the rewrite
  * removes the only pattern it matches.
  */
object PrefixDiffSumRule extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.prefixDiffSum.enabled"
  private val MinSpanKey = "spark.graft.prefixDiffSum.minSpan"

  private def enabled: Boolean =
    SQLConf.get.getConfString(EnabledKey, "false").toBoolean
  private def minSpan: Int =
    SQLConf.get.getConfString(MinSpanKey, "40").toInt

  /** The sliding lower bound −k as a non-negative k, if this is a
    * `ROWS BETWEEN k PRECEDING AND CURRENT ROW` frame. */
  private def precedingRows(frame: WindowFrame): Option[Int] = frame match {
    case SpecifiedWindowFrame(RowFrame, Literal(l: Int, _), CurrentRow) if l < 0 => Some(-l)
    case SpecifiedWindowFrame(RowFrame, Literal(l: Long, _), CurrentRow)
        if l < 0 && -l <= Int.MaxValue => Some((-l).toInt)
    case _ => None
  }

  private def rewritable(ne: NamedExpression, span: Int): Option[(Alias, Sum, Int)] =
    ne match {
      case a @ Alias(WindowExpression(
            AggregateExpression(s: Sum, _, false, None, _),
            WindowSpecDefinition(_, _, frame)), _)
          if s.deterministic &&
            (s.child.dataType == LongType || s.child.dataType.isInstanceOf[DecimalType]) =>
        precedingRows(frame).filter(_ + 1 >= span).map(k => (a, s, k))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    val span = minSpan
    plan.transform {
      case w: Window if w.windowExpressions.exists(rewritable(_, span).isDefined) =>
        val helpers = Seq.newBuilder[NamedExpression]
        // original output order, rewritten entries replaced by a
        // projection that keeps the ORIGINAL exprId/name so parents
        // and the output schema are untouched
        val projected: Seq[NamedExpression] = w.windowExpressions.map { ne =>
          rewritable(ne, span) match {
            case None => ne.toAttribute
            case Some((a, sumFn, k)) =>
              def spec(upper: Expression) = WindowSpecDefinition(
                w.partitionSpec, w.orderSpec,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, upper))
              def winSum(upper: Expression, tag: String) =
                Alias(WindowExpression(sumFn.toAggregateExpression(), spec(upper)),
                  s"__pfx_${tag}_${a.name}")()
              def winCnt(upper: Expression, tag: String) =
                Alias(WindowExpression(
                  Count(Seq(sumFn.child)).toAggregateExpression(), spec(upper)),
                  s"__pfx_${tag}_${a.name}")()
              val pCur = winSum(CurrentRow, "pc")
              val pPast = winSum(Literal(-(k + 1)), "pp")
              val cCur = winCnt(CurrentRow, "cc")
              val cPast = winCnt(Literal(-(k + 1)), "cp")
              helpers ++= Seq(pCur, pPast, cCur, cPast)
              val sumDt = pCur.dataType
              val zero = Cast(Literal(0L), sumDt)
              val diff = Subtract(pCur.toAttribute, Coalesce(Seq(pPast.toAttribute, zero)))
              val diffTyped =
                if (diff.dataType == a.dataType) diff else Cast(diff, a.dataType)
              val guarded = If(
                GreaterThan(Subtract(cCur.toAttribute, cPast.toAttribute), Literal(0L)),
                diffTyped, Literal.create(null, a.dataType))
              Alias(guarded, a.name)(exprId = a.exprId, qualifier = a.qualifier,
                explicitMetadata = a.explicitMetadata)
          }
        }
        val newWindow = w.copy(windowExpressions =
          w.windowExpressions.flatMap(ne =>
            if (rewritable(ne, span).isDefined) Nil else Seq(ne)) ++ helpers.result())
        Project(w.child.output.map(_.asInstanceOf[NamedExpression]) ++ projected, newWindow)
    }
  }
}

/** `spark.sql.extensions` entry point registering the graft optimizer
  * rules on session construction. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => PrefixDiffSumRule)
}
