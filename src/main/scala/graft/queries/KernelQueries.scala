package graft.queries

import org.apache.spark.sql.functions._

import graft.forecast.{Ewma, Kalman}

/** Sequential-recurrence kernels surfaced through the oracle gate.
  *
  * q47 runs the REAL graft.forecast.Ewma kernel inside a per-ticker
  * `groupByKey.flatMapGroups` (the engine's topology for recurrences) and
  * the oracle replays the identical IEEE operation sequence with a
  * DuckDB recursive CTE — so the comparison is bit-exact, no rounding.
  */
object KernelQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    "q47_ewma_vol" -> ((s, dir) => {
      import s.implicits._
      Bars.of(s, dir)
        .select($"ticker", $"ts", $"seq", $"price")
        .as[(String, java.sql.Timestamp, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (ticker, rows) =>
          val sorted = rows.toArray.sortBy(r => (r._2.getTime, r._3))
          val rets = sorted.sliding(2).collect {
            case Array(a, b) => (b._3, b._4 / a._4 - 1) // (seq, return)
          }.toArray
          val path = Ewma.variancePath(rets.map(_._2), 0.94)
          rets.zip(path).map { case ((seq, _), s2) => (ticker, seq, s2) }.iterator
        }
        .toDF("ticker", "seq", "ewma_var")
    }),

    // End-to-end ForecastEngine lifecycle (SURVEY §3.3; reference audit
    // rows forcester_ts/forecaster.py:1864-1960): deterministic seeded
    // fit per ticker bucket → persisted forecast table (parquet write)
    // → SQL read-back. The float predictions are spec-territory (the
    // 164-test suite); what the oracle anchors is the ORCHESTRATION
    // CONTRACT a downstream reader depends on — one ENSEMBLE row per
    // (ticker, horizon step) after the round trip, with the engine's
    // row invariants (lower CI ≤ forecast ≤ upper CI, vol ≥ 0,
    // probUp ∈ [0,1]) holding on every persisted row.
    "q111_forecast_lifecycle" -> ((s, dir) => {
      import s.implicits._
      val horizon = 5
      // deterministic per-bucket hourly price series from purchases
      val series = graft.Tables.load(s, dir, "events")
        .where($"event_type" === "purchase")
        .groupBy(concat(lit("B"), $"user_id" % 3).as("ticker"),
          date_trunc("hour", $"ts").as("h"))
        .agg(Det.davg($"value").as("px"))
      val fc = series.as[(String, java.sql.Timestamp, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (t, rows) =>
          val px = rows.toArray.sortBy(_._2.getTime).map(_._3)
          graft.forecast.ForecastEngine.forecastOne(t, px,
            graft.forecast.ForecastEngine.Config(horizon = horizon,
              mcPaths = 100)).iterator
        }
      // the lifecycle write: forecast table persisted, then read back —
      // the oracle row is computed from the PERSISTED table only
      val store = java.nio.file.Files
        .createTempDirectory("graft_fc_store").toString
      fc.toDF().write.mode("overwrite").parquet(store)
      s.read.parquet(store)
        .where($"model" === "ENSEMBLE")
        .select($"ticker",
          $"horizonStep".as("horizon_step"),
          ($"lowerCi" <= $"forecast" && $"forecast" <= $"upperCi").as("ci_ok"),
          ($"vol" >= 0.0).as("vol_ok"),
          ($"probUp" >= 0.0 && $"probUp" <= 1.0).as("prob_ok"))
    }),

    // q111 anchors the lifecycle CONTRACT; this query anchors the
    // FLOATS: the σ forecast of the ENSEMBLE rows, hash-exact with no
    // tolerance. Capping each bucket at its first 50 hourly points
    // keeps the return series under the GARCH fit's 50-observation
    // minimum, which routes the fit to its deterministic EWMA(0.94)
    // fallback (garch.py:580-633) — σ = sqrt of the EWMA variance
    // recursion over the 99.5%-|r|-clipped returns, flat across the
    // horizon. Every op (davg bucketing, clip cap selection, the
    // recursion, sqrt) is replayed by the DuckDB oracle in the same
    // IEEE order, through a parquet persist → read-back round trip.
    "q114_vol_forecast_floats" -> ((s, dir) => {
      import s.implicits._
      val horizon = 5
      val series = graft.Tables.load(s, dir, "events")
        .where($"event_type" === "purchase")
        .groupBy(concat(lit("B"), $"user_id" % 3).as("ticker"),
          date_trunc("hour", $"ts").as("h"))
        .agg(Det.davg($"value").as("px"))
      val fc = series.as[(String, java.sql.Timestamp, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (t, rows) =>
          val px = rows.toArray.sortBy(_._2.getTime).map(_._3).take(50)
          graft.forecast.ForecastEngine.forecastOne(t, px,
            graft.forecast.ForecastEngine.Config(horizon = horizon,
              mcPaths = 100)).iterator
        }
      val store = java.nio.file.Files
        .createTempDirectory("graft_fc_floats").toString
      fc.toDF().write.mode("overwrite").parquet(store)
      s.read.parquet(store)
        .where($"model" === "ENSEMBLE")
        .select($"ticker", $"horizonStep".as("horizon_step"),
          $"vol".as("sigma"))
    }),

    // Local-level Kalman smoothing of every bar series — the third
    // float path under the gate (after q47's EWMA recursion and q114's
    // σ pipeline), and the first with TWO coupled recurrent states
    // (level a and variance P, linked through the gain division each
    // step). Per-ticker sequential state runs task-side in the same
    // flatMapGroups shape as q47; the DuckDB oracle replays the exact
    // IEEE sequence via a recursive CTE carrying (a, P). Q/R fixed
    // (0.1 / 2.0) — parameter estimation is Ar/Garch territory.
    "q134_kalman_level" -> ((s, dir) => {
      import s.implicits._
      Bars.of(s, dir)
        .select($"ticker", $"ts", $"seq", $"price")
        .as[(String, java.sql.Timestamp, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (ticker, rows) =>
          val sorted = rows.toArray.sortBy(r => (r._2.getTime, r._3))
          val path = Kalman.levelFilter(sorted.map(_._4), q = 0.1, r = 2.0)
          sorted.zip(path).map { case ((_, _, seq, _), (a, p)) =>
            (ticker, seq, a, p)
          }.iterator
        }
        .toDF("ticker", "seq", "level", "level_var")
    })
  )

  override def oracles: Map[String, String] = Map(
    // identical op order: s2_1 = r*r; s2_n = 0.94*prev + (1-0.94)*r*r,
    // all in DOUBLE (the bare 0.94 literal would be DECIMAL in DuckDB and
    // fold 1-0.94 exactly — CASTs force the same IEEE constants Scala uses)
    "q47_ewma_vol" ->
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |rets AS (
         |  SELECT ticker, seq, ts,
         |    price / lag(price, 1) OVER (PARTITION BY ticker ORDER BY ts, seq) - 1 AS r
         |  FROM bars),
         |numbered AS (
         |  SELECT ticker, seq, r,
         |    row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS rn
         |  FROM rets WHERE r IS NOT NULL),
         |rec AS (
         |  SELECT ticker, seq, rn, r * r AS s2 FROM numbered WHERE rn = 1
         |  UNION ALL
         |  SELECT t.ticker, t.seq, t.rn,
         |    CAST(0.94 AS DOUBLE) * rec.s2
         |      + (CAST(1 AS DOUBLE) - CAST(0.94 AS DOUBLE)) * t.r * t.r
         |  FROM numbered t JOIN rec
         |    ON t.ticker = rec.ticker AND t.rn = rec.rn + 1)
         |SELECT ticker, seq, s2 AS ewma_var FROM rec""".stripMargin,

    // the lifecycle contract from the base table alone: every purchase
    // bucket with a fittable history (>=40 hourly points — the engine's
    // minimum) yields exactly `horizon` ENSEMBLE rows whose invariants
    // hold; a missing/extra/duplicated row, a broken CI ordering, or a
    // failed write→read round trip all hash-mismatch
    "q111_forecast_lifecycle" ->
      """WITH buckets AS (
        |  SELECT 'B' || CAST(user_id % 3 AS VARCHAR) AS ticker
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1
        |  HAVING COUNT(DISTINCT date_trunc('hour', ts)) >= 40),
        |steps AS (SELECT UNNEST(range(1, 6)) AS horizon_step)
        |SELECT b.ticker, s.horizon_step,
        |  TRUE AS ci_ok, TRUE AS vol_ok, TRUE AS prob_ok
        |FROM buckets b CROSS JOIN steps s""".stripMargin,

    // the engine's EWMA-fallback σ path replayed op-for-op: davg hourly
    // buckets → first 50 per ticker → simple returns → clip at the abs
    // value ranked floor(0.995·(m−1))+1 (Garch.clip's index arithmetic)
    // → the q47 recursion over the CLIPPED series → sqrt of the final
    // variance, flat across the 5-step horizon. DOUBLE casts force the
    // same IEEE constants Scala uses.
    "q114_vol_forecast_floats" ->
      """WITH RECURSIVE px AS (
        |  SELECT 'B' || CAST(user_id % 3 AS VARCHAR) AS ticker,
        |         date_trunc('hour', ts) AS h,
        |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |           / COUNT(value) AS px
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1, 2),
        |firstn AS (
        |  SELECT ticker, h, px,
        |         row_number() OVER (PARTITION BY ticker ORDER BY h) AS rn,
        |         count(*) OVER (PARTITION BY ticker) AS cnt
        |  FROM px),
        |sel AS (SELECT ticker, h, px FROM firstn WHERE rn <= 50 AND cnt >= 40),
        |rets AS (
        |  SELECT ticker,
        |         px / lag(px) OVER (PARTITION BY ticker ORDER BY h) - 1 AS r,
        |         row_number() OVER (PARTITION BY ticker ORDER BY h) - 1 AS rn
        |  FROM sel),
        |r2 AS (
        |  SELECT ticker, r, rn, count(*) OVER (PARTITION BY ticker) AS m
        |  FROM rets WHERE r IS NOT NULL),
        |caps AS (
        |  SELECT ticker, aval AS cap FROM (
        |    SELECT ticker, ABS(r) AS aval, m,
        |           row_number() OVER (PARTITION BY ticker ORDER BY ABS(r)) AS arn
        |    FROM r2) ranked
        |  WHERE arn = CAST(FLOOR(CAST(0.995 AS DOUBLE) * (m - 1)) AS BIGINT) + 1),
        |clipped AS (
        |  SELECT r2.ticker, r2.rn, r2.m,
        |         GREATEST(-caps.cap, LEAST(caps.cap, r2.r)) AS c
        |  FROM r2 JOIN caps ON r2.ticker = caps.ticker),
        |rec AS (
        |  SELECT ticker, rn, m, c * c AS s2 FROM clipped WHERE rn = 1
        |  UNION ALL
        |  SELECT t.ticker, t.rn, t.m,
        |         CAST(0.94 AS DOUBLE) * rec.s2
        |           + (CAST(1 AS DOUBLE) - CAST(0.94 AS DOUBLE)) * t.c * t.c
        |  FROM clipped t JOIN rec
        |    ON t.ticker = rec.ticker AND t.rn = rec.rn + 1),
        |final AS (SELECT ticker, SQRT(s2) AS sigma FROM rec WHERE rn = m),
        |steps AS (SELECT UNNEST(range(1, 6)) AS horizon_step)
        |SELECT f.ticker, s.horizon_step, f.sigma
        |FROM final f CROSS JOIN steps s""".stripMargin,

    // the filter recursion replayed step for step: the CTE carries
    // (a, P); the gain k = (P+Q)/((P+Q)+R) is inlined (recomputed
    // sub-expressions are value-identical), and every literal is CAST
    // to DOUBLE so DuckDB uses the same IEEE constants Scala does.
    // Ops in Scala order: a' = a + k*(y−a); P' = (1−k)*(P+Q).
    "q134_kalman_level" ->
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |numbered AS (
         |  SELECT ticker, seq, price AS y,
         |    row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS rn
         |  FROM bars),
         |rec AS (
         |  SELECT ticker, seq, rn, y AS a, CAST(2.0 AS DOUBLE) AS p
         |  FROM numbered WHERE rn = 1
         |  UNION ALL
         |  SELECT t.ticker, t.seq, t.rn,
         |    rec.a + ((rec.p + CAST(0.1 AS DOUBLE))
         |        / ((rec.p + CAST(0.1 AS DOUBLE)) + CAST(2.0 AS DOUBLE)))
         |      * (t.y - rec.a),
         |    (CAST(1 AS DOUBLE) - ((rec.p + CAST(0.1 AS DOUBLE))
         |        / ((rec.p + CAST(0.1 AS DOUBLE)) + CAST(2.0 AS DOUBLE))))
         |      * (rec.p + CAST(0.1 AS DOUBLE))
         |  FROM numbered t JOIN rec
         |    ON t.ticker = rec.ticker AND t.rn = rec.rn + 1)
         |SELECT ticker, seq, a AS level, p AS level_var FROM rec""".stripMargin
  )
}
