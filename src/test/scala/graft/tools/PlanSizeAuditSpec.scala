package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins `ExplainAudit --plansize`'s detector and its fixtures: plans
  * whose expression count grows with a PARAMETER (not the schema) pay
  * Catalyst analysis + Janino codegen per instance — the ExactKMeans
  * k=80 class (≈50 s of plan overhead for sub-second data work). The
  * audit itself runs as a main in the round verify path; this spec
  * keeps its guts green under `sbt test`. */
class PlanSizeAuditSpec extends AnyFunSuite with TestSpark {

  test("plansize audit passes: production assignment flat, expr form detected, regime cap fires") {
    assert(ExplainAudit.plansizeViolations(spark) === Seq.empty)
  }

  test("exprWeight sees parameter growth in the raw expression form only") {
    val ed = spark.range(4).selectExpr("id AS vec_id",
      "transform(sequence(0, 3), d -> CAST(d AS DOUBLE) / 10 + id) AS ed")
    def cents(k: Int): Array[Array[Double]] =
      Array.tabulate(k)(j => Array.tabulate(4)(d => j * 0.01 + d * 0.1))
    val exprSmall = ExplainAudit.exprWeight(graft.ml.ExactKMeans.assignExpr(ed, cents(20)))
    val exprLarge = ExplainAudit.exprWeight(graft.ml.ExactKMeans.assignExpr(ed, cents(100)))
    assert(exprLarge > 2 * exprSmall, s"$exprSmall -> $exprLarge")
    val kernSmall = ExplainAudit.exprWeight(graft.ml.ExactKMeans.assignKernel(ed, cents(20)))
    val kernLarge = ExplainAudit.exprWeight(graft.ml.ExactKMeans.assignKernel(ed, cents(100)))
    assert(kernLarge === kernSmall, s"$kernSmall -> $kernLarge")
    // and the production switch routes large k through the flat path
    val prod = ExplainAudit.exprWeight(graft.ml.ExactKMeans.withAssign(ed, cents(100)))
    assert(prod === kernLarge)
  }

  test("regimeMultiplier refuses a config past maxRegimeCells") {
    import org.apache.spark.sql.functions.col
    import graft.stats.BarbellSizing
    val df = spark.range(2).selectExpr("'BULL' AS regime", "'core' AS bucket")
    val over = BarbellSizing.Overlay(regimeMult =
      (0 to BarbellSizing.maxRegimeCells / 2).map(i =>
        s"R$i" -> Map("core" -> 0.9, "spec" -> 0.8)).toMap)
    val e = intercept[IllegalArgumentException] {
      df.select(BarbellSizing.regimeMultiplier(col("regime"), col("bucket"), over))
    }
    assert(e.getMessage.contains("maxRegimeCells")
      || e.getMessage.contains("cells"))
  }
}
