package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the embedding-similarity hot path —
  * the §2.14 "custom `Expression` with `doGenCode`" tier: a dot product
  * or norm via `aggregate`/`zip_with`/`transform` builds per-element
  * lambda frames in the INTERPRETER (higher-order functions never enter
  * whole-stage codegen), which measured ~10× slower than this compiled
  * loop on |corpus|²-pair scoring. The generated code folds strictly
  * left-to-right over doubles — the exact float path of the SQL shapes
  * it replaces (`aggregate(zip_with(a, b, (x, y) -> x*y), 0.0, +)` and
  * `sqrt(aggregate(transform(a, x -> x*x), 0.0, +))`) — so results are
  * bit-identical and the DuckDB oracles keep hash-matching.
  *
  * Element-null contract: inputs are dense numeric vectors (parquet
  * `array<float>` cast to `array<double>`); a null ELEMENT reads as 0
  * per ArrayData semantics rather than nulling the result — matching
  * neither SQL shape — so feed these only non-null-element arrays (the
  * embedding tables guarantee it).
  */
object VectorExprs {

  /** Σ aᵢ·bᵢ over the common prefix length, left-to-right. */
  case class DotF64(left: Expression, right: Expression)
      extends BinaryExpression {
    // no ExpectsInputTypes: constructed only from the Column API below,
    // which documents the array<double> contract (AbstractDataType is
    // private[sql] in Spark 4)
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_dot_f64"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val s = ctx.freshName("dotSum")
        val n = ctx.freshName("dotLen")
        val i = ctx.freshName("dotIdx")
        s"""
           |double $s = 0.0;
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** sqrt(Σ aᵢ²), left-to-right. */
  case class L2NormF64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_l2norm_f64"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val s = ctx.freshName("nrmSum")
        val n = ctx.freshName("nrmLen")
        val i = ctx.freshName("nrmIdx")
        val v = ctx.freshName("nrmV")
        s"""
           |double $s = 0.0;
           |int $n = $a.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = $a.getDouble($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private def toCol(e: Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)
  private def ex(c: Column): Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)

  /** Column API: `dotF64(a, b)` / `l2normF64(a)` over `array<double>`
    * (cast `array<float>` inputs first, exactly as the SQL shapes do). */
  def dotF64(a: Column, b: Column): Column = toCol(DotF64(ex(a), ex(b)))
  def l2normF64(a: Column): Column = toCol(L2NormF64(ex(a)))
}
