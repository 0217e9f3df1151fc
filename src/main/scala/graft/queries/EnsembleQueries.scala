package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.forecast.Ensemble

/** The Ensemble coordinator under the oracle gate (reference
  * forcester_ts/ensemble.py:99-912): candidate set + auto_directional DA
  * candidate, eligibility, normalize + min-component floor, confidence
  * scaling, the DA cap-and-redistribute penalty, Σ wᵢ·confᵢ scoring,
  * stable top-1 with the diversity preference, and the NaN-aware blend.
  *
  * The gate uses a TWO-model universe ("a", "b"): every internal map sum
  * then has ≤ 2 terms, and IEEE addition is commutative, so the Scala
  * Map fold order cannot move a bit — the whole selectFull/blend chain
  * is replayable as closed-form scalar SQL. Per-ticker confidence/DA
  * grids steer branch coverage: the DA floor drop (x ≤ 0 at ti=1), the
  * cap-and-redistribute trigger (da_a < 0.45 with w_a > 0.10), and a
  * per-ticker NaN step in model b's forecast exercises blend recovery.
  */
object EnsembleQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    "q161_ensemble_select" -> ((s, dir) => {
      import s.implicits._
      val dim = Bars.of(s, dir).groupBy($"ticker")
        .agg(Det.davg($"price").as("lp"))
        .withColumn("ti",
          row_number().over(Window.orderBy($"ticker")).cast("int"))
        .select($"ticker", $"lp", $"ti")
      dim.as[(String, Double, Int)].flatMap { case (t, lp, ti) =>
        val conf = Map("a" -> (0.3 + 0.1 * ti), "b" -> (0.9 - 0.1 * ti))
        val da = Map("a" -> (0.38 + 0.02 * ti), "b" -> (0.50 + 0.02 * ti))
        val cands = Seq(
          Ensemble.Candidate("solo_a", Map("a" -> 1.0)),
          Ensemble.Candidate("solo_b", Map("b" -> 1.0)),
          Ensemble.Candidate("blend_6040", Map("a" -> 0.6, "b" -> 0.4)))
        val hN = ti % 5 + 1
        val fa = Array.tabulate(5)(h => lp * (1 + 0.01 * (h + 1)))
        val fb = Array.tabulate(5)(h =>
          if (h + 1 == hN) Double.NaN else lp * (1 + 0.008 * (h + 1)))
        val sel = Ensemble.selectFull(cands, conf, da).get
        val blended = Ensemble.blend(Map("a" -> fa, "b" -> fb),
          sel.candidate.weights)
        (0 until 5).map { h =>
          (t, sel.candidate.name, sel.score,
            sel.candidate.weights.get("a"), sel.candidate.weights.get("b"),
            h + 1, blended(h))
        }
      }.toDF("ticker", "chosen", "score", "w_a", "w_b", "h", "blended")
    })
  )

  override def oracles: Map[String, String] = Map(
    // the candidate pipeline as closed-form scalar stages per
    // (ticker, candidate): pos-filter → /total → 0.05 floor →
    // renormalize (twice: raw then confidence-scaled) → DA cap →
    // score; stable (score DESC, cidx) order; diversity re-selection;
    // 2-term NaN-aware blend. Absent weights are NULL throughout.
    "q161_ensemble_select" ->
      s"""${Bars.sql},
         |dim AS (
         |  SELECT ticker, ${Det.sqlAvg("price")} AS lp,
         |    CAST(row_number() OVER (ORDER BY ticker) AS INT) AS ti
         |  FROM bars GROUP BY ticker),
         |d AS MATERIALIZED (
         |  SELECT ticker, lp, ti,
         |    CAST(0.3 AS DOUBLE) + CAST(0.1 AS DOUBLE) * ti AS conf_a,
         |    CAST(0.9 AS DOUBLE) - CAST(0.1 AS DOUBLE) * ti AS conf_b,
         |    CAST(0.38 AS DOUBLE) + CAST(0.02 AS DOUBLE) * ti AS da_a,
         |    CAST(0.50 AS DOUBLE) + CAST(0.02 AS DOUBLE) * ti AS da_b
         |  FROM dim),
         |cands AS MATERIALIZED (
         |  SELECT d.*, c.cidx, c.name,
         |    CASE c.cidx
         |      WHEN 0 THEN CASE WHEN (da_a - CAST(0.40 AS DOUBLE)) / CAST(0.20 AS DOUBLE) > 0
         |                       THEN (da_a - CAST(0.40 AS DOUBLE)) / CAST(0.20 AS DOUBLE) END
         |      WHEN 1 THEN CAST(1.0 AS DOUBLE)
         |      WHEN 3 THEN CAST(0.6 AS DOUBLE) END AS wa0,
         |    CASE c.cidx
         |      WHEN 0 THEN CASE WHEN (da_b - CAST(0.40 AS DOUBLE)) / CAST(0.20 AS DOUBLE) > 0
         |                       THEN (da_b - CAST(0.40 AS DOUBLE)) / CAST(0.20 AS DOUBLE) END
         |      WHEN 2 THEN CAST(1.0 AS DOUBLE)
         |      WHEN 3 THEN CAST(0.4 AS DOUBLE) END AS wb0
         |  FROM d CROSS JOIN (VALUES (0, 'auto_directional'), (1, 'solo_a'),
         |    (2, 'solo_b'), (3, 'blend_6040')) c(cidx, name)
         |  WHERE NOT (c.cidx = 0 AND
         |    (da_a - CAST(0.40 AS DOUBLE)) / CAST(0.20 AS DOUBLE) <= 0 AND
         |    (da_b - CAST(0.40 AS DOUBLE)) / CAST(0.20 AS DOUBLE) <= 0)),
         |n0 AS MATERIALIZED (
         |  SELECT *,
         |    CASE WHEN wa0 > 0 THEN wa0 END AS pa,
         |    CASE WHEN wb0 > 0 THEN wb0 END AS pb
         |  FROM cands),
         |n1 AS MATERIALIZED (
         |  SELECT *, COALESCE(pa, 0) + COALESCE(pb, 0) AS tot FROM n0),
         |n2 AS MATERIALIZED (
         |  SELECT *,
         |    CASE WHEN tot > 0 AND pa / tot >= CAST(0.05 AS DOUBLE)
         |      THEN pa / tot END AS ka,
         |    CASE WHEN tot > 0 AND pb / tot >= CAST(0.05 AS DOUBLE)
         |      THEN pb / tot END AS kb
         |  FROM n1),
         |n3 AS MATERIALIZED (
         |  SELECT *,
         |    ka / (COALESCE(ka, 0) + COALESCE(kb, 0)) AS na,
         |    kb / (COALESCE(ka, 0) + COALESCE(kb, 0)) AS nb
         |  FROM n2),
         |c0 AS MATERIALIZED (
         |  SELECT *,
         |    CASE WHEN na * conf_a > 0 THEN na * conf_a END AS ca,
         |    CASE WHEN nb * conf_b > 0 THEN nb * conf_b END AS cb
         |  FROM n3),
         |c1 AS MATERIALIZED (
         |  SELECT *, COALESCE(ca, 0) + COALESCE(cb, 0) AS ctot FROM c0),
         |c2 AS MATERIALIZED (
         |  SELECT *,
         |    CASE WHEN ctot > 0 AND ca / ctot >= CAST(0.05 AS DOUBLE)
         |      THEN ca / ctot END AS cka,
         |    CASE WHEN ctot > 0 AND cb / ctot >= CAST(0.05 AS DOUBLE)
         |      THEN cb / ctot END AS ckb
         |  FROM c1),
         |c3 AS MATERIALIZED (
         |  SELECT *,
         |    cka / (COALESCE(cka, 0) + COALESCE(ckb, 0)) AS sa,
         |    ckb / (COALESCE(cka, 0) + COALESCE(ckb, 0)) AS sb
         |  FROM c2),
         |cap AS MATERIALIZED (
         |  SELECT *,
         |    (sa IS NOT NULL AND da_a < CAST(0.45 AS DOUBLE)) AS pen_a,
         |    (sb IS NOT NULL AND da_b < CAST(0.45 AS DOUBLE)) AS pen_b
         |  FROM c3),
         |cap2 AS MATERIALIZED (
         |  SELECT *,
         |    ((pen_a AND sa > CAST(0.10 AS DOUBLE)) OR
         |     (pen_b AND sb > CAST(0.10 AS DOUBLE))) AS trig
         |  FROM cap),
         |-- fixed = min(w, cap) for penalized; nonPen keeps w; with two
         |-- models at most one side is penalized here (da_b ≥ 0.52), so
         |-- remaining redistributes to the other model when present
         |capped AS MATERIALIZED (
         |  SELECT *,
         |    CASE
         |      WHEN NOT trig THEN sa
         |      WHEN pen_a THEN LEAST(sa, CAST(0.10 AS DOUBLE))
         |      WHEN sa IS NULL THEN NULL
         |      ELSE sa / sa * GREATEST(CAST(0.0 AS DOUBLE),
         |        1 - COALESCE(CASE WHEN pen_b
         |              THEN LEAST(sb, CAST(0.10 AS DOUBLE)) END, 0))
         |    END AS wa,
         |    CASE
         |      WHEN NOT trig THEN sb
         |      WHEN pen_b THEN LEAST(sb, CAST(0.10 AS DOUBLE))
         |      WHEN sb IS NULL THEN NULL
         |      ELSE sb / sb * GREATEST(CAST(0.0 AS DOUBLE),
         |        1 - COALESCE(CASE WHEN pen_a
         |              THEN LEAST(sa, CAST(0.10 AS DOUBLE)) END, 0))
         |    END AS wb,
         |    -- applyDaCap returns empty when EVERY model is penalized
         |    (trig AND pen_a AND (sb IS NULL OR pen_b)) OR
         |    (trig AND pen_b AND (sa IS NULL OR pen_a)) AS dropped
         |  FROM cap2),
         |scored AS MATERIALIZED (
         |  SELECT ticker, lp, ti, cidx, name, conf_a, conf_b, wa, wb,
         |    COALESCE(wa * conf_a, 0) + COALESCE(wb * conf_b, 0) AS score,
         |    (CASE WHEN wa IS NOT NULL THEN 1 ELSE 0 END +
         |     CASE WHEN wb IS NOT NULL THEN 1 ELSE 0 END) AS sz
         |  FROM capped
         |  WHERE NOT dropped AND (wa IS NOT NULL OR wb IS NOT NULL)),
         |ranked AS MATERIALIZED (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY ticker ORDER BY score DESC, cidx) AS rnk
         |  FROM scored),
         |best AS (SELECT * FROM ranked WHERE rnk = 1),
         |alt AS (
         |  SELECT r.ticker, MIN(r.rnk) AS arnk
         |  FROM ranked r JOIN best b ON b.ticker = r.ticker
         |  WHERE r.sz >= 2 AND r.score >= b.score - CAST(0.05 AS DOUBLE)
         |  GROUP BY r.ticker),
         |chosen AS (
         |  SELECT r.* FROM ranked r
         |  JOIN best b ON b.ticker = r.ticker
         |  LEFT JOIN alt a ON a.ticker = r.ticker
         |  WHERE r.rnk = CASE WHEN b.sz >= 2 THEN 1
         |                     ELSE COALESCE(a.arnk, 1) END),
         |steps AS (SELECT UNNEST(range(1, 6)) AS h)
         |SELECT c.ticker, c.name AS chosen, c.score, c.wa AS w_a,
         |  c.wb AS w_b, s.h,
         |  CASE
         |    WHEN c.wa IS NOT NULL AND c.wb IS NOT NULL
         |         AND NOT (s.h = c.ti % 5 + 1) THEN
         |      c.wa / (c.wa + c.wb) * (c.lp * (1 + CAST(0.01 AS DOUBLE) * s.h))
         |      + c.wb / (c.wa + c.wb) * (c.lp * (1 + CAST(0.008 AS DOUBLE) * s.h))
         |    WHEN c.wa IS NOT NULL AND (c.wb IS NULL OR s.h = c.ti % 5 + 1) THEN
         |      c.wa / c.wa * (c.lp * (1 + CAST(0.01 AS DOUBLE) * s.h))
         |    WHEN c.wb IS NOT NULL AND NOT (s.h = c.ti % 5 + 1) THEN
         |      c.wb / c.wb * (c.lp * (1 + CAST(0.008 AS DOUBLE) * s.h))
         |    ELSE CAST('nan' AS DOUBLE)
         |  END AS blended
         |FROM chosen c CROSS JOIN steps s""".stripMargin
  )
}
