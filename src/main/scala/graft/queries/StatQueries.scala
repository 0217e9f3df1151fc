package graft.queries

import org.apache.spark.sql.functions._

import graft.stats.PortfolioMath

/** Portfolio-math scalar kernels under the oracle gate.
  *
  * q163: Shapley attribution over a three-model universe (reference
  * models/ensemble attribution; PortfolioMath.shapley) — the coalition
  * value function is a closed-form max-plus-diversity score over
  * per-ticker data aggregates, so every subset value and the factorial
  * weights replay exactly; each model's contribution is a FOUR-term sum
  * mirrored in the Scala subsets() enumeration order (∅, {o1}, {o2},
  * {o1,o2} — size-ascending, insertion order within size).
  */
object StatQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    "q163_shapley" -> ((s, dir) => {
      import s.implicits._
      Bars.of(s, dir).groupBy($"ticker")
        .agg(Det.davg($"price").as("lp"), Det.dstddev($"price").as("sd"))
        .select($"ticker", $"lp", $"sd")
        .as[(String, Double, Double)]
        .flatMap { case (t, lp, sd) =>
          val skill = Map(
            "a" -> lp / (lp + 100.0),
            "b" -> sd / (sd + 50.0),
            "c" -> 0.5)
          def value(ms: Set[String]): Double =
            if (ms.isEmpty) 0.0
            else ms.map(skill).max + 0.05 * (ms.size - 1)
          PortfolioMath.shapley(Seq("a", "b", "c"), value)
            .toSeq.map { case (m, v) => (t, m, v) }
        }
        .toDF("ticker", "model", "shap")
    })
  )

  override def oracles: Map[String, String] = Map(
    // per model m with others (o1, o2) in seq order, the contribution is
    // w0·(v({m})−v(∅)) + w1·(v({o1,m})−v({o1})) + w1·(v({o2,m})−v({o2}))
    // + w0·(v({o1,o2,m})−v({o1,o2})), summed left-to-right, with
    // w0 = 0!·2!/3! and w1 = 1!·1!/3! computed in double exactly as
    // Scala's fact()/fact() division does
    "q163_shapley" ->
      s"""${Bars.sql},
         |d AS MATERIALIZED (
         |  SELECT ticker, ${Det.sqlAvg("price")} AS lp,
         |         ${Det.sqlStddev("price")} AS sd
         |  FROM bars GROUP BY ticker),
         |sk AS MATERIALIZED (
         |  SELECT ticker,
         |    lp / (lp + CAST(100.0 AS DOUBLE)) AS sa,
         |    sd / (sd + CAST(50.0 AS DOUBLE)) AS sb,
         |    CAST(0.5 AS DOUBLE) AS sc,
         |    CAST(2.0 AS DOUBLE) / CAST(6.0 AS DOUBLE) AS w0,
         |    CAST(1.0 AS DOUBLE) / CAST(6.0 AS DOUBLE) AS w1,
         |    CAST(0.05 AS DOUBLE) AS dv
         |  FROM d),
         |v AS MATERIALIZED (
         |  SELECT *,
         |    sa AS v_a, sb AS v_b, sc AS v_c,
         |    GREATEST(sa, sb) + dv AS v_ab,
         |    GREATEST(sa, sc) + dv AS v_ac,
         |    GREATEST(sb, sc) + dv AS v_bc,
         |    GREATEST(GREATEST(sa, sb), sc) + dv * 2 AS v_abc
         |  FROM sk)
         |SELECT ticker, m.model,
         |  CASE m.model
         |    WHEN 'a' THEN
         |      (((CAST(0.0 AS DOUBLE) + w0 * (v_a - CAST(0.0 AS DOUBLE)))
         |        + w1 * (v_ab - v_b)) + w1 * (v_ac - v_c)) + w0 * (v_abc - v_bc)
         |    WHEN 'b' THEN
         |      (((CAST(0.0 AS DOUBLE) + w0 * (v_b - CAST(0.0 AS DOUBLE)))
         |        + w1 * (v_ab - v_a)) + w1 * (v_bc - v_c)) + w0 * (v_abc - v_ac)
         |    ELSE
         |      (((CAST(0.0 AS DOUBLE) + w0 * (v_c - CAST(0.0 AS DOUBLE)))
         |        + w1 * (v_ac - v_a)) + w1 * (v_bc - v_b)) + w0 * (v_abc - v_ab)
         |  END AS shap
         |FROM v CROSS JOIN (VALUES ('a'), ('b'), ('c')) m(model)""".stripMargin
  )
}
