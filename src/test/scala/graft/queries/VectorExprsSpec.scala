package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorExprs.{dotF64, l2normF64}

/** The native codegen dot/norm must be BIT-identical to the
  * aggregate/zip_with SQL shapes they replace (same left-to-right
  * fold), null-safe on null arrays, and correct under whole-stage
  * codegen with many distinct instances in one projection. */
class VectorExprsSpec extends AnyFunSuite with TestSpark {

  test("dotF64/l2normF64 are bit-identical to the higher-order-function SQL") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(5)
    val rows = (1 to 500).map { i =>
      (i.toLong,
        Array.fill(64)((rng.nextDouble() - 0.4) * math.pow(10, rng.nextInt(3))),
        Array.fill(64)(rng.nextDouble() * 3 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val sqlDot = expr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val sqlNorm = expr(
      "sqrt(aggregate(transform(a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))")
    val out = df.select(
      (dotF64($"a", $"b") === sqlDot).as("dotEq"),
      (l2normF64($"a") === sqlNorm).as("nrmEq"),
      // several instances in ONE projection: codegen fresh-name hygiene
      (dotF64($"b", $"a") === dotF64($"b", $"a")).as("selfEq"))
    assert(out.where(!$"dotEq" || !$"nrmEq" || !$"selfEq").count() === 0)
  }

  test("null arrays yield null (null-intolerant), interpreted path agrees with codegen") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Option(Array(1.0, 2.0)), Option(Array(3.0, 4.0))),
      (2L, None: Option[Array[Double]], Option(Array(3.0, 4.0)))).toDF("id", "a", "b")
    val r = df.select($"id", dotF64($"a", $"b").as("d"), l2normF64($"a").as("n"))
      .orderBy("id").collect()
    assert(r(0).getDouble(1) === 11.0 && math.abs(r(0).getDouble(2) - math.sqrt(5.0)) < 1e-15)
    assert(r(1).isNullAt(1) && r(1).isNullAt(2))
    // interpreted evaluation (no codegen): same values
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def arr(a: Array[Double]) = Literal.create(a, ArrayType(DoubleType))
    val interp = graft.functions.VectorExprs
      .DotF64(arr(Array(1.0, 2.0)), arr(Array(3.0, 4.0))).eval(null)
    assert(interp === 11.0)
  }
}
