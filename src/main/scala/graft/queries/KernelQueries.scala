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

  /** Fixed-per-JVM, pid-scoped scratch dir (graft.queries.Scratch;
    * mode=overwrite on every use): fixed within a JVM so the bench's
    * min-of-3 × multi-pass loop doesn't leak one parquet dir per rep,
    * pid-scoped so two concurrent JVMs (driver Verify beside a local
    * bench/test run) can't overwrite each other's store mid-read,
    * exit-cleaned by the shared shutdown hook. */
  private def scratch(name: String): String = Scratch.dir(name)

  /** Second-bucketed davg price series per event_type, capped at the
    * first 200 points per ticker — the shared input of the q151/q152
    * sequential-kernel gates (bounded train keeps the oracle recursions
    * seconds-cheap at any SF; see q151's cap comment). */
  private def secondSeries(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val wT = org.apache.spark.sql.expressions.Window
      .partitionBy($"ticker").orderBy($"date")
    graft.Tables.load(s, dir, "events")
      .groupBy($"event_type".as("ticker"),
        date_trunc("second", $"ts").as("date"))
      .agg(Det.davg($"value").as("close"))
      .withColumn("rn", row_number().over(wT)).where($"rn" <= 200)
      .drop("rn")
  }

  override def queries: Map[String, QFn] = Map(
    "q47_ewma_vol" -> ((s, dir) => {
      import s.implicits._
      // firstN(600): in-plan rank filter bounds the per-group footprint
      // AND fixes the oracle's recursion depth at every SF (Bars.sqlFirstN)
      Bars.firstN(s, dir, 600)
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
      val store = scratch("fc_store")
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
      val store = scratch("fc_floats")
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
      Bars.firstN(s, dir, 600) // fixed oracle recursion depth per SF
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
    }),

    // The AR(p)-via-OLS forecast MEAN under the hash gate — the last
    // unanchored float family out of the forecast stack (q114 pinned σ,
    // q134 the Kalman states; this pins the mean). AR(2), d=0, on
    // q114's hourly davg series, through the ENGINE'S PRODUCTION FIT:
    // Ar.fitArP assembles the normal equations with explicit
    // ascending-row loops (one accumulator per X'X / X'y entry — the
    // IEEE order the oracle CTE replays), solves them through
    // LinAlg.solveSpd (the 3×3 Cholesky + both substitutions unroll to
    // the oracle's scalar expressions, ridge arm unreachable on these
    // well-conditioned systems), and Ar.forecast's d=0 recursion
    // yields the means. Nothing here is a reimplementation — the real
    // fit path is hash-exact through a parquet round trip, no
    // tolerance.
    "q148_ar_ols_mean" -> ((s, dir) => {
      import s.implicits._
      val series = graft.Tables.load(s, dir, "events")
        .where($"event_type" === "purchase")
        .groupBy(concat(lit("B"), $"user_id" % 3).as("ticker"),
          date_trunc("hour", $"ts").as("h"))
        .agg(Det.davg($"value").as("px"))
      val fc = series.as[(String, java.sql.Timestamp, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (t, rows) =>
          val x = rows.toArray.sortBy(_._2.getTime).map(_._3).take(50)
          if (x.length < 40) Iterator.empty
          else graft.forecast.Ar.fitArP(x, 2, 0) match {
            case Some(fit) =>
              val (mu, lo, hi) = graft.forecast.Ar.forecast(x, fit, horizon = 5)
              (0 until 5).iterator.map(h => (t, h + 1, mu(h), lo(h), hi(h)))
            case None => Iterator.empty
          }
        }
      val store = scratch("ar_ols_mean")
      fc.toDF("ticker", "horizon_step", "mu", "lo", "hi")
        .write.mode("overwrite").parquet(store)
      s.read.parquet(store)
    }),

    // The GARCH(1,1) conditional-variance filter + σ horizon forecast
    // under the hash gate — the engine's Garch.variancePath (h₁ = Σr²/n
    // unconditional init in array order, hᵢ = ω + α·r²ᵢ₋₁ + β·hᵢ₋₁) and
    // Garch.forecastVol's cumulative-product horizon path (pk ← pk·ρ, no
    // math.pow — bit-replayable across engines; reference
    // forcester_ts/garch.py:643-738). Params are fixed canonical literals
    // (the MLE fit is Nelder–Mead, spec territory — the q134 pattern of
    // pinning the FILTER, not the estimator); clip at p99.5 |r| replays
    // q114's rank arithmetic. Output carries the FULL in-sample variance
    // path (kind='h') plus the 5-step σ forecast (kind='fc'), through a
    // parquet persist → read-back round trip, hash-exact, no tolerance.
    "q149_garch_vol_path" -> ((s, dir) => {
      import s.implicits._
      val fit = graft.forecast.Garch.Fit(omega = 2e-6, alpha = 0.08,
        beta = 0.90, persistence = 0.98, logLik = 0.0, converged = true,
        usedEwma = false)
      val out = Bars.firstN(s, dir, 600) // fixed oracle depth per SF
        .as[(String, java.sql.Timestamp, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (ticker, rows) =>
          val sorted = rows.toArray.sortBy(r => (r._2.getTime, r._3))
          val rets = sorted.sliding(2).collect {
            case Array(a, b) => b._4 / a._4 - 1
          }.toArray
          if (rets.length < 3) Iterator.empty
          else {
            val clipped = graft.forecast.Garch.clip(rets)
            val path = graft.forecast.Garch.variancePath(
              clipped, fit.omega, fit.alpha, fit.beta)
            val sig = graft.forecast.Garch.forecastVol(rets, fit, horizon = 5)
            path.iterator.zipWithIndex.map { case (h, i) =>
              (ticker, "h", (i + 1).toLong, h) } ++
              sig.iterator.zipWithIndex.map { case (sg, k) =>
                (ticker, "fc", (k + 1).toLong, sg) }
          }
        }
      val store = scratch("garch_vol_path")
      out.toDF("ticker", "kind", "step", "value")
        .write.mode("overwrite").parquet(store)
      s.read.parquet(store)
    }),

    // SSA reconstruction under the hash gate — the last unanchored
    // forecast-kernel float family (reference forcester_ts/samossa.py:
    // 116-197: Hankel → SVD → variance-target rank → diagonal
    // averaging). Window fixed at 2 so the whole pipeline is SQL-
    // unrollable while every stage stays REAL engine code: the 2×2 Gram
    // accumulates in ascending array order (Ssa.mm), LinAlg.eigSym's
    // Jacobi sweeps replay as a recursive CTE carrying the full
    // (a, v) state with the engine's exact rotation op order and
    // off>tol·scale termination, the variance-target rank pick (1 vs 2)
    // is a CASE on the same clamped eigenvalue ratio, and the projector
    // U_r·U_rᵀ·H + diagonal averaging unroll to scalar expressions.
    // Rank is data-dependent per ticker and emitted, so the oracle also
    // pins the rank-selection branch. Hash-exact, no tolerance.
    "q150_ssa_recon" -> ((s, dir) => {
      import s.implicits._
      val series = graft.Tables.load(s, dir, "events")
        .where($"event_type" === "purchase")
        .groupBy(concat(lit("B"), $"user_id" % 3).as("ticker"),
          date_trunc("hour", $"ts").as("h"))
        .agg(Det.davg($"value").as("px"))
      val fc = series.as[(String, java.sql.Timestamp, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (t, rows) =>
          val x = rows.toArray.sortBy(_._2.getTime).map(_._3).take(50)
          if (x.length < 40) Iterator.empty
          else {
            val dec = graft.forecast.Ssa.decompose(x, window = 2)
            dec.reconstruction.iterator.zipWithIndex.map { case (v, i) =>
              (t, (i + 1).toLong, dec.rank, v)
            }
          }
        }
      val store = scratch("ssa_recon")
      fc.toDF("ticker", "idx", "rank", "value")
        .write.mode("overwrite").parquet(store)
      s.read.parquet(store)
    }),

    // Walk-forward / rolling-origin evaluation under the hash gate —
    // the REAL WalkForward.run fold engine (expanding prefixes,
    // usable = n − h·k, trainEnd per fold, actuals alignment, the
    // rmse/DA formulas; reference forcester_ts/walk_forward_learner.py:
    // 81-398) with the AR(2)-OLS kernel plugged in (the q148-anchored
    // fit path — the full model zoo is spec territory). Second-bucketed
    // davg series per event_type so every ticker clears the 60-usable
    // floor at sf0.001 too (the B-bucket hourly series does not).
    // The oracle replays the fold boundary arithmetic, the
    // per-(ticker, fold) normal-equation/Cholesky fit, the 5-step mean
    // recursion, and the fold-ordered RMSE/DA sums. Hash-exact.
    "q151_walk_forward" -> ((s, dir) => {
      import s.implicits._
      val series = secondSeries(s, dir)
      val arOls = (t: String, px: Array[Double],
          cfg: graft.forecast.ForecastEngine.Config) =>
        graft.forecast.Ar.fitArP(px, 2, 0) match {
          case Some(fit) =>
            val (mu, _, _) = graft.forecast.Ar.forecast(px, fit, cfg.horizon)
            mu.toSeq.zipWithIndex.map { case (m, i) =>
              graft.forecast.ForecastEngine.TickerForecast(t, "NA", "AR_OLS",
                1.0, i + 1, m, m, m, 0.0, 0.5)
            }
          case None => Seq.empty
        }
      val fm = graft.forecast.WalkForward.run(series, k = 4, horizon = 5,
        forecaster = arOls)
      val store = scratch("walk_forward")
      fm.toDF()
        .select($"ticker", $"foldId".as("fold_id"), $"model", $"rmse",
          $"da", $"nTest".as("n_test"))
        .write.mode("overwrite").parquet(store)
      s.read.parquet(store)
    }),

    // The MSSA-RL CUSUM change-point detector under the hash gate
    // (reference forcester_ts/mssa_rl.py:616-649): Welford baseline on
    // the first 30 samples of the CURRENT segment, two-sided cumulative
    // z-score scan with drift k=0.5, re-baseline after every alarm.
    // threshold=3.0 so the 200-point series actually alarms (and
    // re-baselines) at both SFs — the default 8.0 barely fires on this
    // data. Emits every break index plus a per-ticker break COUNT row
    // (kind='n') so the no-break case is pinned too. The oracle replays
    // the full sequential state machine — (segStart, n, mean, m2, hi,
    // lo) carried through a recursive CTE with the engine's exact op
    // order, including the Welford mean-then-m2 update and the
    // max(1e-12, sqrt(m2/max(1, n−1))) floor. Hash-exact.
    "q152_cusum_breaks" -> ((s, dir) => {
      import s.implicits._
      val out = secondSeries(s, dir)
        .as[(String, java.sql.Timestamp, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (t, rows) =>
          val px = rows.toArray.sortBy(_._2.getTime).map(_._3)
          val breaks = graft.forecast.MssaRl.cusum(px, threshold = 3.0)
          breaks.iterator.map(i => (t, "brk", i.toLong)) ++
            Iterator((t, "n", breaks.length.toLong))
        }
      val store = scratch("cusum_breaks")
      out.toDF("ticker", "kind", "val")
        .write.mode("overwrite").parquet(store)
      s.read.parquet(store)
    }),

    // The ARIMA d=1 arm under the hash gate — the differencing path
    // q148 left unanchored (reference forcester_ts/sarimax.py:225-297:
    // unit-root gate → difference → fit → integrate back). Cumulative
    // sums of the second series are near-unit-root (ρ₁ ≈ 0.984 at both
    // SFs), so the engine's REAL chooseD (lag-1 autocorrelation ≥ 0.95)
    // selects d=1, fitArP runs on the differenced series, and
    // Ar.forecast integrates the 5-step diff predictions back to levels
    // with the √(σ²h) cumulative-variance CI widening. The emitted d
    // column pins the unit-root branch decision itself. Hash-exact.
    "q153_ar_diff_forecast" -> ((s, dir) => {
      import s.implicits._
      val out = secondSeries(s, dir)
        .as[(String, java.sql.Timestamp, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (t, rows) =>
          val px = rows.toArray.sortBy(_._2.getTime).map(_._3)
          var c = 0.0
          val cum = px.map { v => c += v; c }
          val d = graft.forecast.Ar.chooseD(cum)
          val xd = graft.forecast.Ar.difference(cum, d)
          graft.forecast.Ar.fitArP(xd, 2, d) match {
            case Some(fit) =>
              val (mu, lo, hi) = graft.forecast.Ar.forecast(cum, fit, 5)
              (0 until 5).iterator.map(h =>
                (t, d, h + 1, mu(h), lo(h), hi(h)))
            case None => Iterator.empty
          }
        }
      val store = scratch("ar_diff_forecast")
      out.toDF("ticker", "d", "horizon_step", "mu", "lo", "hi")
        .write.mode("overwrite").parquet(store)
      s.read.parquet(store)
    }),

    // The exog-ARX regression core + VIF pruner under the hash gate
    // (reference forcester_ts/forecaster.py:307-402 _build_sarimax_exog,
    // :403-479 _prune_exog_features_vif): the REAL Exog.vifReport /
    // fitArx / forecast kernels run per ticker over the first 60 bars
    // with two deterministic exog columns (linear index, weekday
    // cycle). Exog's normal equations accumulate explicitly ascending
    // (no breeze gemm), so the oracle replays X'X / X'y row-by-row, the
    // 4×4 and 2×2 Cholesky solves op-for-op, both VIF regressions, σ²,
    // the Gaussian log-likelihood AIC, and the recursive 3-step exog
    // forecast. Parquet round trip, hash-exact, no tolerance.
    "q170_exog_arx" -> ((s, dir) => {
      import s.implicits._
      // The exog design (linear index, weekday cycle) is data-independent
      // and n is fixed at 60, so the VIF pair is a constant — compute the
      // 2x2 regressions once here, not once per ticker inside the groups
      // iterator. (Tickers with < 60 bars are dropped below, so every
      // surviving group sees this exact design.)
      val n0 = 60
      val ex1 = Array.tabulate(n0)(i => (i + 1).toDouble)
      val ex2 = Array.tabulate(n0)(i => ((i + 1) % 7).toDouble)
      val vifs = graft.forecast.Exog.vifReport(Array(ex1, ex2))
      val out = Bars.firstN(s, dir, 60)
        .as[(String, java.sql.Timestamp, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (ticker, rows) =>
          val px = rows.toArray.sortBy(r => (r._2.getTime, r._3))
            .map(_._4).take(60)
          // Constant-price tickers are skipped IDENTICALLY in the oracle
          // (HAVING MIN(price) < MAX(price) — an exact comparison, so both
          // engines take the same branch). This pins the varying-price
          // precondition the kernels' internal degenerate guards (ridge
          // escalation, VIF ssTot clamp) otherwise depend on, instead of
          // trusting the two engines to agree on 0/0 arithmetic.
          if (px.length < 60 || px.min == px.max) Iterator.empty
          else {
            val n = px.length
            val x1 = ex1
            val x2 = ex2
            val fit = graft.forecast.Exog.fitArx(px, Array(x1, x2), p = 1)
            val fut = Array.tabulate(3)(h => fit.keptExog.map(j =>
              if (j == 0) (n + 1 + h).toDouble
              else ((n + 1 + h) % 7).toDouble).toArray)
            val mu = graft.forecast.Exog.forecast(px, fit, fut, horizon = 3)
            Iterator.single((ticker, fit.intercept, fit.arCoefs(0),
              fit.exogCoefs.lift(0).getOrElse(Double.NaN),
              fit.exogCoefs.lift(1).getOrElse(Double.NaN),
              fit.sigma2, fit.aic, vifs(0), vifs(1), fit.keptExog.size,
              mu(0), mu(1), mu(2)))
          }
        }
      val store = scratch("exog_arx")
      out.toDF("ticker", "icept", "ar1", "b1", "b2", "sigma2", "aic",
        "vif1", "vif2", "kept_n", "mu1", "mu2", "mu3")
        .write.mode("overwrite").parquet(store)
      s.read.parquet(store)
    }),

    // The regime detector under the hash gate (reference
    // forcester_ts/regime_detector.py:30-310): the REAL
    // RegimeDetector.detect per ticker over the first 180 bars — every
    // feature float (annualized realized vol, vol-of-vol over the 51
    // rolling-10 vols, trend slope/R², the 19-lag power-law Hurst fit,
    // standardized skew/kurtosis via explicit z-products, no libm pow)
    // plus the rule-tree regime/confidence/model-recommendation outputs.
    // The oracle replays every sequential sum (mean and centered passes
    // separately, in the kernel's ascending order), the rolling windows
    // as explicit 10-term left-associated adds, and the closed-form
    // rule tree.
    "q172_regime_detect" -> ((s, dir) => {
      import s.implicits._
      val out = Bars.firstN(s, dir, 180)
        .as[(String, java.sql.Timestamp, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (ticker, rows) =>
          val px = rows.toArray.sortBy(r => (r._2.getTime, r._3))
            .map(_._4).take(180)
          // Mirror of the oracle's HAVING MIN(price) < MAX(price): a
          // constant-price ticker would hit trend()'s sxx==0 -> (0,0) and
          // hurst()'s sxx==0 -> 0.5 guards kernel-side while the oracle
          // divides by zero — skip such tickers identically in both engines.
          if (px.length < 180 || px.min == px.max) Iterator.empty
          else {
            val r = graft.forecast.RegimeDetector.detect(px, window = 60)
            val f = r.features
            Iterator.single((ticker, r.regime, r.confidence,
              f.realizedVol, f.volOfVol, f.trendR2, f.trendSlope,
              f.hurst, f.skew, f.kurtosis,
              r.recommendedModels.mkString(",")))
          }
        }
      val store = scratch("regime_detect")
      out.toDF("ticker", "regime", "conf", "rv", "vov", "trend_r2",
        "trend_slope", "hurst", "skew", "kurt", "models")
        .write.mode("overwrite").parquet(store)
      s.read.parquet(store)
    })
  )

  override def oracles: Map[String, String] = Map(
    // identical op order: s2_1 = r*r; s2_n = 0.94*prev + (1-0.94)*r*r,
    // all in DOUBLE (the bare 0.94 literal would be DECIMAL in DuckDB and
    // fold 1-0.94 exactly — CASTs force the same IEEE constants Scala uses)
    "q47_ewma_vol" ->
      s"""${Bars.sqlFirstN(600).replace("WITH bars", "WITH RECURSIVE bars")},
         |rets AS (
         |  SELECT ticker, seq, ts,
         |    price / lag(price, 1) OVER (PARTITION BY ticker ORDER BY ts, seq) - 1 AS r
         |  FROM barsn),
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
      s"""${Bars.sqlFirstN(600).replace("WITH bars", "WITH RECURSIVE bars")},
         |numbered AS (
         |  SELECT ticker, seq, price AS y,
         |    row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS rn
         |  FROM barsn),
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
         |SELECT ticker, seq, a AS level, p AS level_var FROM rec""".stripMargin,

    // Replays the kernel's exact IEEE sequence: the normal-equation
    // accumulators step in ascending row order (one recursive CTE), the
    // 3×3 Cholesky + both substitutions unroll solveSpd's scalar op
    // order (subtraction order in parens matters), and the 5-step mean
    // recursion mirrors Ar.forecast's d=0 arm (Scala's Array.sum folds
    // from 0.0 left-to-right → b0 + (b1*x + b2*y)).
    "q148_ar_ols_mean" ->
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
        |sel AS (SELECT ticker, rn, px FROM firstn WHERE rn <= 50 AND cnt >= 40),
        |lagd AS (
        |  SELECT ticker, rn, px AS y,
        |         lag(px, 1) OVER (PARTITION BY ticker ORDER BY rn) AS l1,
        |         lag(px, 2) OVER (PARTITION BY ticker ORDER BY rn) AS l2
        |  FROM sel),
        |rows3 AS (SELECT ticker, rn, y, l1, l2 FROM lagd WHERE rn >= 3),
        |acc AS (
        |  SELECT ticker, rn,
        |    CAST(1 AS DOUBLE) AS s00, l1 AS s01, l2 AS s02,
        |    l1*l1 AS s11, l1*l2 AS s12, l2*l2 AS s22,
        |    y AS t0, l1*y AS t1, l2*y AS t2
        |  FROM rows3 WHERE rn = 3
        |  UNION ALL
        |  SELECT r.ticker, r.rn,
        |    a.s00 + CAST(1 AS DOUBLE), a.s01 + r.l1, a.s02 + r.l2,
        |    a.s11 + r.l1*r.l1, a.s12 + r.l1*r.l2, a.s22 + r.l2*r.l2,
        |    a.t0 + r.y, a.t1 + r.l1*r.y, a.t2 + r.l2*r.y
        |  FROM rows3 r JOIN acc a ON r.ticker = a.ticker AND r.rn = a.rn + 1),
        |nf AS (
        |  SELECT a.* FROM acc a
        |  JOIN (SELECT ticker, MAX(rn) AS mx FROM rows3 GROUP BY 1) m
        |    ON a.ticker = m.ticker AND a.rn = m.mx),
        |c1 AS (SELECT *, sqrt(s00) AS l00 FROM nf),
        |c2 AS (SELECT *, s01 / l00 AS l10, s02 / l00 AS l20 FROM c1),
        |c3 AS (SELECT *, sqrt(s11 - l10*l10) AS l11 FROM c2),
        |c4 AS (SELECT *, (s12 - l20*l10) / l11 AS l21 FROM c3),
        |c5 AS (SELECT *, sqrt((s22 - l20*l20) - l21*l21) AS l22 FROM c4),
        |f0 AS (SELECT *, t0 / l00 AS w0 FROM c5),
        |f1 AS (SELECT *, (t1 - l10*w0) / l11 AS w1 FROM f0),
        |f2 AS (SELECT *, ((t2 - l20*w0) - l21*w1) / l22 AS w2 FROM f1),
        |k2 AS (SELECT *, w2 / l22 AS b2 FROM f2),
        |k1 AS (SELECT *, (w1 - l21*b2) / l11 AS b1 FROM k2),
        |k0 AS MATERIALIZED (SELECT *, ((w0 - l10*b1) - l20*b2) / l00 AS b0 FROM k1),
        |lastx AS MATERIALIZED (
        |  SELECT s.ticker,
        |    MAX(CASE WHEN s.rn = m.mx THEN s.px END) AS xa,
        |    MAX(CASE WHEN s.rn = m.mx - 1 THEN s.px END) AS xb
        |  FROM sel s JOIN (SELECT ticker, MAX(rn) AS mx FROM sel GROUP BY 1) m
        |    ON s.ticker = m.ticker
        |  GROUP BY 1),
        |rs AS (
        |  SELECT r.ticker, r.rn,
        |    (r.y - ((k.b0 + r.l1*k.b1) + r.l2*k.b2))
        |      * (r.y - ((k.b0 + r.l1*k.b1) + r.l2*k.b2)) AS rss
        |  FROM rows3 r JOIN k0 k ON r.ticker = k.ticker WHERE r.rn = 3
        |  UNION ALL
        |  SELECT r.ticker, r.rn,
        |    rs.rss + (r.y - ((k.b0 + r.l1*k.b1) + r.l2*k.b2))
        |      * (r.y - ((k.b0 + r.l1*k.b1) + r.l2*k.b2))
        |  FROM rows3 r
        |  JOIN rs ON r.ticker = rs.ticker AND r.rn = rs.rn + 1
        |  JOIN k0 k ON r.ticker = k.ticker),
        |sg AS (
        |  SELECT a.ticker,
        |    sqrt(GREATEST(CAST(1e-12 AS DOUBLE), f.rss / a.s00)) AS se
        |  FROM nf a JOIN rs f ON a.ticker = f.ticker AND f.rn = a.rn),
        |fc AS (
        |  SELECT k.ticker, 1 AS h, k.b0 + (k.b1*l.xa + k.b2*l.xb) AS p,
        |         l.xa AS prev
        |  FROM k0 k JOIN lastx l ON k.ticker = l.ticker
        |  UNION ALL
        |  SELECT f.ticker, f.h + 1, k.b0 + (k.b1*f.p + k.b2*f.prev), f.p
        |  FROM fc f JOIN k0 k ON f.ticker = k.ticker WHERE f.h < 5)
        |SELECT f.ticker, f.h AS horizon_step, f.p AS mu,
        |  f.p - CAST(1.959963984540054 AS DOUBLE) * g.se AS lo,
        |  f.p + CAST(1.959963984540054 AS DOUBLE) * g.se AS hi
        |FROM fc f JOIN sg g ON f.ticker = g.ticker""".stripMargin,

    // Replays Garch.variancePath + forecastVol op-for-op: simple returns
    // in (ts, seq) order → clip at the abs value ranked
    // floor(0.995·(m−1))+1 (Garch.clip's index arithmetic, as in q114) →
    // Σc² accumulated in ascending array order (a recursive CTE — plain
    // SUM() need not fold left-to-right) → h recursion carrying the
    // previous clipped return → h1 = ω + α·c_m² + β·h_m, long-run
    // ω/(1−ρ), and the pk←pk·ρ cumulative-product forecast. Every
    // literal CAST to DOUBLE so DuckDB folds the same IEEE constants
    // Scala uses.
    "q149_garch_vol_path" ->
      s"""${Bars.sqlFirstN(600).replace("WITH bars", "WITH RECURSIVE bars")},
         |rets AS (
         |  SELECT ticker,
         |    price / lag(price, 1) OVER (PARTITION BY ticker ORDER BY ts, seq) - 1 AS r,
         |    row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) - 1 AS rn
         |  FROM barsn),
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
         |  FROM r2 JOIN caps ON r2.ticker = caps.ticker
         |  WHERE r2.m >= 3),
         |ss AS (
         |  SELECT ticker, rn, m, c * c AS sq FROM clipped WHERE rn = 1
         |  UNION ALL
         |  SELECT t.ticker, t.rn, t.m, ss.sq + t.c * t.c
         |  FROM clipped t JOIN ss ON t.ticker = ss.ticker AND t.rn = ss.rn + 1),
         |h1u AS (SELECT ticker, sq / m AS h0 FROM ss WHERE rn = m),
         |hrec AS (
         |  SELECT c.ticker, c.rn, c.m, c.c, h1u.h0 AS h
         |  FROM clipped c JOIN h1u ON c.ticker = h1u.ticker WHERE c.rn = 1
         |  UNION ALL
         |  SELECT t.ticker, t.rn, t.m, t.c,
         |    CAST(2e-6 AS DOUBLE) + CAST(0.08 AS DOUBLE) * hrec.c * hrec.c
         |      + CAST(0.90 AS DOUBLE) * hrec.h
         |  FROM clipped t JOIN hrec ON t.ticker = hrec.ticker AND t.rn = hrec.rn + 1),
         |fstart AS (
         |  SELECT ticker,
         |    CAST(2e-6 AS DOUBLE) + CAST(0.08 AS DOUBLE) * c * c
         |      + CAST(0.90 AS DOUBLE) * h AS h1f
         |  FROM hrec WHERE rn = m),
         |fc AS (
         |  SELECT ticker, 1 AS k, CAST(1 AS DOUBLE) AS pk, h1f FROM fstart
         |  UNION ALL
         |  SELECT ticker, k + 1,
         |    pk * (CAST(0.08 AS DOUBLE) + CAST(0.90 AS DOUBLE)), h1f
         |  FROM fc WHERE k < 5)
         |SELECT ticker, 'h' AS kind, rn AS step, h AS value FROM hrec
         |UNION ALL
         |SELECT ticker, 'fc' AS kind, CAST(k AS BIGINT) AS step,
         |  SQRT(GREATEST(CAST(0 AS DOUBLE),
         |    CAST(2e-6 AS DOUBLE)
         |      / (CAST(1 AS DOUBLE) - (CAST(0.08 AS DOUBLE) + CAST(0.90 AS DOUBLE)))
         |    + pk * (h1f - CAST(2e-6 AS DOUBLE)
         |      / (CAST(1 AS DOUBLE) - (CAST(0.08 AS DOUBLE) + CAST(0.90 AS DOUBLE))))))
         |    AS value
         |FROM fc""".stripMargin,

    // Replays Ssa.decompose(window=2) op-for-op: the 2×2 Gram sums
    // accumulate ascending (recursive CTE — Ssa.mm's k-loop order), the
    // Jacobi recursion carries the full (a00,a01,a10,a11 | v) state and
    // reproduces LinAlg.eigSym's exact rotation sequence (column pass
    // writes b, row pass reads b — the nested derived tables keep that
    // two-phase order), terminating on the engine's off>1e-12·scale
    // check with the 64-sweep cap; eigenpairs sort by (-value, index),
    // clamp at 0, the variance-target rank branch is the same l0/total
    // ratio, and the projector + diagonal averaging unroll exactly
    // (interior positions (a0+a1)/2, edges count 1).
    "q150_ssa_recon" ->
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
        |sel AS (SELECT ticker, rn, px FROM firstn WHERE rn <= 50 AND cnt >= 40),
        |nn AS (SELECT ticker, MAX(rn) AS n FROM sel GROUP BY 1),
        |prs AS (
        |  SELECT s.ticker, s.rn AS j, s.px AS xa, s2.px AS xb
        |  FROM sel s JOIN sel s2 ON s.ticker = s2.ticker AND s2.rn = s.rn + 1),
        |gacc AS (
        |  SELECT ticker, j, xa*xa AS g11, xa*xb AS g12, xb*xb AS g22
        |  FROM prs WHERE j = 1
        |  UNION ALL
        |  SELECT p.ticker, p.j, g.g11 + p.xa*p.xa, g.g12 + p.xa*p.xb,
        |         g.g22 + p.xb*p.xb
        |  FROM prs p JOIN gacc g ON p.ticker = g.ticker AND p.j = g.j + 1),
        |gram AS (
        |  SELECT g.ticker, g.g11, g.g12, g.g22,
        |         greatest(CAST(1e-300 AS DOUBLE),
        |                  greatest(abs(g.g11), abs(g.g22))) AS scale
        |  FROM gacc g JOIN nn ON g.ticker = nn.ticker AND g.j = nn.n - 1),
        |jrec AS (
        |  SELECT ticker, 0 AS sweep, g11 AS a00, g12 AS a01, g12 AS a10,
        |         g22 AS a11,
        |         CAST(1 AS DOUBLE) AS v00, CAST(0 AS DOUBLE) AS v01,
        |         CAST(0 AS DOUBLE) AS v10, CAST(1 AS DOUBLE) AS v11, scale
        |  FROM gram
        |  UNION ALL
        |  SELECT ticker, sweep + 1,
        |    CASE WHEN rot THEN c*b00 - s*b10 ELSE a00 END,
        |    CASE WHEN rot THEN c*b01 - s*b11 ELSE a01 END,
        |    CASE WHEN rot THEN s*b00 + c*b10 ELSE a10 END,
        |    CASE WHEN rot THEN s*b01 + c*b11 ELSE a11 END,
        |    CASE WHEN rot THEN c*v00 - s*v01 ELSE v00 END,
        |    CASE WHEN rot THEN s*v00 + c*v01 ELSE v01 END,
        |    CASE WHEN rot THEN c*v10 - s*v11 ELSE v10 END,
        |    CASE WHEN rot THEN s*v10 + c*v11 ELSE v11 END,
        |    scale
        |  FROM (
        |    SELECT q2.*, c*a00 - s*a01 AS b00, s*a00 + c*a01 AS b01,
        |           c*a10 - s*a11 AS b10, s*a10 + c*a11 AS b11
        |    FROM (
        |      SELECT q1.*,
        |        CAST(1 AS DOUBLE)/sqrt(t*t + CAST(1 AS DOUBLE)) AS c,
        |        t*(CAST(1 AS DOUBLE)/sqrt(t*t + CAST(1 AS DOUBLE))) AS s
        |      FROM (
        |        SELECT q0.*,
        |          CASE WHEN theta = 0
        |            THEN CAST(1 AS DOUBLE)
        |              / (theta + sqrt(theta*theta + CAST(1 AS DOUBLE)))
        |            ELSE CAST(sign(theta) AS DOUBLE)
        |              / (abs(theta) + sqrt(theta*theta + CAST(1 AS DOUBLE))) END AS t
        |        FROM (
        |          SELECT jrec.*, abs(a01) > CAST(1e-300 AS DOUBLE) AS rot,
        |            (a11 - a00) / (CAST(2 AS DOUBLE)*a01) AS theta
        |          FROM jrec
        |          WHERE abs(a01) > CAST(1e-12 AS DOUBLE)*scale AND sweep < 64
        |        ) q0
        |      ) q1
        |    ) q2
        |  ) q3),
        |jfin AS (
        |  SELECT j.* FROM jrec j
        |  JOIN (SELECT ticker, MAX(sweep) AS ms FROM jrec GROUP BY 1) m
        |    ON j.ticker = m.ticker AND j.sweep = m.ms),
        |eig AS (
        |  SELECT ticker,
        |    greatest(CASE WHEN a00 >= a11 THEN a00 ELSE a11 END,
        |             CAST(0 AS DOUBLE)) AS l0,
        |    greatest(CASE WHEN a00 >= a11 THEN a11 ELSE a00 END,
        |             CAST(0 AS DOUBLE)) AS l1,
        |    CASE WHEN a00 >= a11 THEN v00 ELSE v01 END AS u00,
        |    CASE WHEN a00 >= a11 THEN v10 ELSE v11 END AS u10,
        |    CASE WHEN a00 >= a11 THEN v01 ELSE v00 END AS u01,
        |    CASE WHEN a00 >= a11 THEN v11 ELSE v10 END AS u11
        |  FROM jfin),
        |eigr AS (
        |  SELECT ticker, u00, u10, u01, u11,
        |    CASE WHEN l0 / greatest(l0 + l1, CAST(1e-300 AS DOUBLE))
        |           < CAST(0.90 AS DOUBLE) THEN 2 ELSE 1 END AS rank
        |  FROM eig),
        |appx AS (
        |  SELECT p.ticker, p.j,
        |    CASE WHEN e.rank = 1 THEN e.u00*(e.u00*p.xa + e.u10*p.xb)
        |         ELSE e.u00*(e.u00*p.xa + e.u10*p.xb)
        |            + e.u01*(e.u01*p.xa + e.u11*p.xb) END AS a0,
        |    CASE WHEN e.rank = 1 THEN e.u10*(e.u00*p.xa + e.u10*p.xb)
        |         ELSE e.u10*(e.u00*p.xa + e.u10*p.xb)
        |            + e.u11*(e.u01*p.xa + e.u11*p.xb) END AS a1
        |  FROM prs p JOIN eigr e ON p.ticker = e.ticker)
        |SELECT s.ticker, s.rn AS idx, e.rank,
        |  CASE WHEN s.rn = 1 THEN c0.a0
        |       WHEN s.rn = nn.n THEN c1.a1
        |       ELSE (c0.a0 + c1.a1) / CAST(2 AS DOUBLE) END AS value
        |FROM sel s
        |JOIN nn ON s.ticker = nn.ticker
        |JOIN eigr e ON s.ticker = e.ticker
        |LEFT JOIN appx c0 ON s.ticker = c0.ticker AND c0.j = s.rn
        |LEFT JOIN appx c1 ON s.ticker = c1.ticker AND c1.j = s.rn - 1""".stripMargin,

    // Replays WalkForward.run with the AR-OLS kernel: fold boundaries
    // (usable = n − h·k ≥ 60, trainEnd per expanding fold), the
    // per-(ticker, fold) normal-equation accumulation + 3×3 Cholesky in
    // fitArP's exact op order (the q148 CTE keyed by fold), the d=0
    // 5-step mean recursion, and the fold-ordered RMSE / directional-
    // accuracy sums (prev(1) = last train price, prev(h) = actual(h−1)).
    "q151_walk_forward" ->
      """WITH RECURSIVE px AS MATERIALIZED (
        |  SELECT event_type AS ticker,
        |         date_trunc('second', ts) AS h,
        |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |           / COUNT(value) AS px
        |  FROM events
        |  GROUP BY 1, 2),
        |sel0 AS (
        |  SELECT ticker, px,
        |         row_number() OVER (PARTITION BY ticker ORDER BY h) AS rn
        |  FROM px),
        |sel AS MATERIALIZED (
        |  SELECT ticker, px, rn,
        |         count(*) OVER (PARTITION BY ticker) AS n
        |  FROM sel0 WHERE rn <= 200),
        |folds AS MATERIALIZED (
        |  SELECT t.ticker, f.fold_id,
        |         (t.n - 20) + (f.fold_id - 1) * 5 AS te
        |  FROM (SELECT ticker, MAX(n) AS n FROM sel GROUP BY 1) t
        |  CROSS JOIN (SELECT UNNEST([1, 2, 3, 4]) AS fold_id) f
        |  WHERE t.n - 20 >= 60),
        |lagd AS (
        |  SELECT ticker, rn, px AS y,
        |         lag(px, 1) OVER (PARTITION BY ticker ORDER BY rn) AS l1,
        |         lag(px, 2) OVER (PARTITION BY ticker ORDER BY rn) AS l2
        |  FROM sel),
        |rows3 AS MATERIALIZED (
        |  SELECT d.ticker, f.fold_id, f.te, d.rn, d.y, d.l1, d.l2
        |  FROM lagd d JOIN folds f ON d.ticker = f.ticker
        |  WHERE d.rn >= 3 AND d.rn <= f.te),
        |acc AS (
        |  SELECT ticker, fold_id, te, rn,
        |    CAST(1 AS DOUBLE) AS s00, l1 AS s01, l2 AS s02,
        |    l1*l1 AS s11, l1*l2 AS s12, l2*l2 AS s22,
        |    y AS t0, l1*y AS t1, l2*y AS t2
        |  FROM rows3 WHERE rn = 3
        |  UNION ALL
        |  SELECT r.ticker, r.fold_id, r.te, r.rn,
        |    a.s00 + CAST(1 AS DOUBLE), a.s01 + r.l1, a.s02 + r.l2,
        |    a.s11 + r.l1*r.l1, a.s12 + r.l1*r.l2, a.s22 + r.l2*r.l2,
        |    a.t0 + r.y, a.t1 + r.l1*r.y, a.t2 + r.l2*r.y
        |  FROM rows3 r JOIN acc a ON r.ticker = a.ticker
        |    AND r.fold_id = a.fold_id AND r.rn = a.rn + 1),
        |nf AS (SELECT * FROM acc WHERE rn = te),
        |c1 AS (SELECT *, sqrt(s00) AS l00 FROM nf),
        |c2 AS (SELECT *, s01 / l00 AS l10, s02 / l00 AS l20 FROM c1),
        |c3 AS (SELECT *, sqrt(s11 - l10*l10) AS l11 FROM c2),
        |c4 AS (SELECT *, (s12 - l20*l10) / l11 AS l21 FROM c3),
        |c5 AS (SELECT *, sqrt((s22 - l20*l20) - l21*l21) AS l22 FROM c4),
        |f0 AS (SELECT *, t0 / l00 AS w0 FROM c5),
        |f1 AS (SELECT *, (t1 - l10*w0) / l11 AS w1 FROM f0),
        |f2 AS (SELECT *, ((t2 - l20*w0) - l21*w1) / l22 AS w2 FROM f1),
        |k2 AS (SELECT *, w2 / l22 AS b2 FROM f2),
        |k1 AS (SELECT *, (w1 - l21*b2) / l11 AS b1 FROM k2),
        |k0 AS (SELECT *, ((w0 - l10*b1) - l20*b2) / l00 AS b0 FROM k1),
        |lastx AS (
        |  SELECT f.ticker, f.fold_id,
        |    MAX(CASE WHEN s.rn = f.te THEN s.px END) AS xa,
        |    MAX(CASE WHEN s.rn = f.te - 1 THEN s.px END) AS xb
        |  FROM folds f JOIN sel s ON f.ticker = s.ticker
        |  WHERE s.rn IN (f.te, f.te - 1)
        |  GROUP BY 1, 2),
        |fc AS (
        |  SELECT k.ticker, k.fold_id, 1 AS h,
        |         k.b0 + (k.b1*l.xa + k.b2*l.xb) AS p, l.xa AS prev
        |  FROM k0 k JOIN lastx l
        |    ON k.ticker = l.ticker AND k.fold_id = l.fold_id
        |  UNION ALL
        |  SELECT f.ticker, f.fold_id, f.h + 1,
        |         k.b0 + (k.b1*f.p + k.b2*f.prev), f.p
        |  FROM fc f JOIN k0 k
        |    ON f.ticker = k.ticker AND f.fold_id = k.fold_id
        |  WHERE f.h < 5),
        |acts AS (
        |  SELECT f.ticker, f.fold_id, s.rn - f.te AS h, s.px AS a
        |  FROM folds f JOIN sel s ON f.ticker = s.ticker
        |  WHERE s.rn > f.te AND s.rn <= f.te + 5),
        |piv AS (
        |  SELECT j.ticker, j.fold_id,
        |    MAX(CASE WHEN j.h = 1 THEN j.p END) AS p1,
        |    MAX(CASE WHEN j.h = 2 THEN j.p END) AS p2,
        |    MAX(CASE WHEN j.h = 3 THEN j.p END) AS p3,
        |    MAX(CASE WHEN j.h = 4 THEN j.p END) AS p4,
        |    MAX(CASE WHEN j.h = 5 THEN j.p END) AS p5,
        |    MAX(CASE WHEN j.h = 1 THEN j.a END) AS a1,
        |    MAX(CASE WHEN j.h = 2 THEN j.a END) AS a2,
        |    MAX(CASE WHEN j.h = 3 THEN j.a END) AS a3,
        |    MAX(CASE WHEN j.h = 4 THEN j.a END) AS a4,
        |    MAX(CASE WHEN j.h = 5 THEN j.a END) AS a5
        |  FROM (SELECT fc.ticker, fc.fold_id, fc.h, fc.p, ac.a
        |        FROM fc JOIN acts ac ON fc.ticker = ac.ticker
        |          AND fc.fold_id = ac.fold_id AND fc.h = ac.h) j
        |  GROUP BY 1, 2)
        |SELECT v.ticker, v.fold_id, 'AR_OLS' AS model,
        |  sqrt((((((v.p1 - v.a1)*(v.p1 - v.a1)
        |    + (v.p2 - v.a2)*(v.p2 - v.a2))
        |    + (v.p3 - v.a3)*(v.p3 - v.a3))
        |    + (v.p4 - v.a4)*(v.p4 - v.a4))
        |    + (v.p5 - v.a5)*(v.p5 - v.a5)) / 5) AS rmse,
        |  CAST((((((CASE WHEN sign(v.p1 - l.xa) = sign(v.a1 - l.xa)
        |        THEN 1 ELSE 0 END)
        |    + (CASE WHEN sign(v.p2 - v.a1) = sign(v.a2 - v.a1)
        |        THEN 1 ELSE 0 END))
        |    + (CASE WHEN sign(v.p3 - v.a2) = sign(v.a3 - v.a2)
        |        THEN 1 ELSE 0 END))
        |    + (CASE WHEN sign(v.p4 - v.a3) = sign(v.a4 - v.a3)
        |        THEN 1 ELSE 0 END))
        |    + (CASE WHEN sign(v.p5 - v.a4) = sign(v.a5 - v.a4)
        |        THEN 1 ELSE 0 END)) AS DOUBLE) / 5 AS da,
        |  5 AS n_test
        |FROM piv v JOIN lastx l
        |  ON v.ticker = l.ticker AND v.fold_id = l.fold_id""".stripMargin,

    // Replays MssaRl.cusum's sequential state machine: the recursive
    // CTE carries (segStart, n, mean, m2, hi, lo) per ticker; calib
    // steps apply Welford in the engine's order (mean' = mean + d/n',
    // then m2' = m2 + d·(v − mean')); scan steps use the engine's sd
    // floor and the (hi + z) − k / (lo + z) + k op order; an alarm
    // resets the whole state at the alarm index. Constants CAST to
    // DOUBLE; the <32-sample early return is replayed by restricting
    // the scan to tickers with ≥32 points (count rows still cover all).
    "q152_cusum_breaks" ->
      """WITH RECURSIVE px AS (
        |  SELECT event_type AS ticker,
        |         date_trunc('second', ts) AS h,
        |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |           / COUNT(value) AS px
        |  FROM events
        |  GROUP BY 1, 2),
        |sel0 AS (
        |  SELECT ticker, px,
        |         row_number() OVER (PARTITION BY ticker ORDER BY h) AS rn
        |  FROM px),
        |sel AS MATERIALIZED (SELECT ticker, px, rn FROM sel0 WHERE rn <= 200),
        |tick AS MATERIALIZED (SELECT ticker, COUNT(*) AS n FROM sel GROUP BY 1),
        |rec AS (
        |  SELECT ticker, -1 AS i, 0 AS seg_start, CAST(0 AS BIGINT) AS n,
        |         CAST(0 AS DOUBLE) AS mean, CAST(0 AS DOUBLE) AS m2,
        |         CAST(0 AS DOUBLE) AS hi, CAST(0 AS DOUBLE) AS lo,
        |         FALSE AS alarm
        |  FROM tick WHERE n >= 32
        |  UNION ALL
        |  SELECT q4.ticker, q4.i2,
        |    CASE WHEN q4.al THEN q4.i2 ELSE q4.seg_start END,
        |    CASE WHEN q4.al THEN CAST(0 AS BIGINT)
        |         WHEN q4.cal THEN q4.n + 1 ELSE q4.n END,
        |    CASE WHEN q4.al THEN CAST(0 AS DOUBLE)
        |         WHEN q4.cal THEN q4.mean2 ELSE q4.mean END,
        |    CASE WHEN q4.al THEN CAST(0 AS DOUBLE)
        |         WHEN q4.cal THEN q4.m22 ELSE q4.m2 END,
        |    CASE WHEN q4.al THEN CAST(0 AS DOUBLE)
        |         WHEN q4.cal THEN q4.hi ELSE q4.hi2 END,
        |    CASE WHEN q4.al THEN CAST(0 AS DOUBLE)
        |         WHEN q4.cal THEN q4.lo ELSE q4.lo2 END,
        |    q4.al
        |  FROM (
        |    SELECT q3.*, (NOT q3.cal) AND
        |      (q3.hi2 > CAST(3.0 AS DOUBLE) OR q3.lo2 < -CAST(3.0 AS DOUBLE)) AS al
        |    FROM (
        |      SELECT q2.*, m2 + d * (v - mean2) AS m22,
        |        greatest(CAST(0 AS DOUBLE),
        |          hi + (v - mean) / greatest(CAST(1e-12 AS DOUBLE),
        |            sqrt(m2 / greatest(1, n - 1))) - CAST(0.5 AS DOUBLE)) AS hi2,
        |        least(CAST(0 AS DOUBLE),
        |          lo + (v - mean) / greatest(CAST(1e-12 AS DOUBLE),
        |            sqrt(m2 / greatest(1, n - 1))) + CAST(0.5 AS DOUBLE)) AS lo2
        |      FROM (
        |        SELECT q1.*, mean + d / (n + 1) AS mean2
        |        FROM (
        |          SELECT r.ticker, r.seg_start, r.n, r.mean, r.m2, r.hi, r.lo,
        |                 s.px AS v, r.i + 1 AS i2,
        |                 (r.i + 1 - r.seg_start) < 30 AS cal,
        |                 s.px - r.mean AS d
        |          FROM rec r JOIN sel s
        |            ON s.ticker = r.ticker AND s.rn = r.i + 2
        |        ) q1
        |      ) q2
        |    ) q3
        |  ) q4)
        |SELECT ticker, 'brk' AS kind, CAST(i AS BIGINT) AS val
        |FROM rec WHERE alarm
        |UNION ALL
        |SELECT t.ticker, 'n' AS kind, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS val
        |FROM tick t LEFT JOIN (
        |  SELECT ticker, COUNT(*) AS cnt FROM rec WHERE alarm GROUP BY 1) c
        |  ON t.ticker = c.ticker""".stripMargin,

    // Replays the d=1 ARIMA arm op-for-op: the running cumsum and its
    // Σc (one recursion, left-assoc), chooseD's ρ₁ accumulators (a
    // second recursion carrying the previous value), the diff series,
    // the q148 normal-equation/Cholesky fit ON THE DIFFS with the rss
    // recursion for σ², and the forecast recursion carrying
    // (p, prev, level) — levels integrate left-assoc from the last
    // cum value, CIs widen as ±z·sqrt(max(1e-12, rss/n)·h).
    "q153_ar_diff_forecast" ->
      """WITH RECURSIVE px AS MATERIALIZED (
        |  SELECT event_type AS ticker,
        |         date_trunc('second', ts) AS h,
        |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |           / COUNT(value) AS px
        |  FROM events
        |  GROUP BY 1, 2),
        |sel0 AS (
        |  SELECT ticker, px,
        |         row_number() OVER (PARTITION BY ticker ORDER BY h) AS rn
        |  FROM px),
        |sel AS MATERIALIZED (SELECT ticker, px, rn FROM sel0 WHERE rn <= 200),
        |nn AS MATERIALIZED (SELECT ticker, MAX(rn) AS n FROM sel GROUP BY 1),
        |rcum AS (
        |  SELECT ticker, rn, px AS c, px AS s2 FROM sel WHERE rn = 1
        |  UNION ALL
        |  SELECT t.ticker, t.rn, r.c + t.px, r.s2 + (r.c + t.px)
        |  FROM sel t JOIN rcum r ON t.ticker = r.ticker AND t.rn = r.rn + 1),
        |cums AS MATERIALIZED (SELECT ticker, rn, c, s2 FROM rcum),
        |mstat AS MATERIALIZED (
        |  SELECT rc.ticker, rc.s2 / nn.n AS m, rc.c AS c_n
        |  FROM cums rc JOIN nn ON rc.ticker = nn.ticker AND rc.rn = nn.n),
        |rr AS (
        |  SELECT rc.ticker, rc.rn, rc.c,
        |         (rc.c - ms.m) * (rc.c - ms.m) AS dacc,
        |         CAST(0 AS DOUBLE) AS nacc
        |  FROM cums rc JOIN mstat ms ON rc.ticker = ms.ticker
        |  WHERE rc.rn = 1
        |  UNION ALL
        |  SELECT t.ticker, t.rn, t.c,
        |         r.dacc + (t.c - ms.m) * (t.c - ms.m),
        |         r.nacc + (t.c - ms.m) * (r.c - ms.m)
        |  FROM cums t
        |  JOIN rr r ON t.ticker = r.ticker AND t.rn = r.rn + 1
        |  JOIN mstat ms ON t.ticker = ms.ticker),
        |dch AS (
        |  SELECT r.ticker,
        |    CASE WHEN r.dacc <= 0 THEN 0
        |         WHEN r.nacc / r.dacc >= CAST(0.95 AS DOUBLE) THEN 1
        |         ELSE 0 END AS d
        |  FROM rr r JOIN nn ON r.ticker = nn.ticker AND r.rn = nn.n),
        |zz AS MATERIALIZED (
        |  SELECT a.ticker, a.rn AS rz, b.c - a.c AS z
        |  FROM cums a JOIN cums b
        |    ON a.ticker = b.ticker AND b.rn = a.rn + 1),
        |lagd AS (
        |  SELECT ticker, rz, z AS y,
        |         lag(z, 1) OVER (PARTITION BY ticker ORDER BY rz) AS l1,
        |         lag(z, 2) OVER (PARTITION BY ticker ORDER BY rz) AS l2
        |  FROM zz),
        |rows3 AS MATERIALIZED (SELECT ticker, rz, y, l1, l2 FROM lagd WHERE rz >= 3),
        |acc AS (
        |  SELECT ticker, rz,
        |    CAST(1 AS DOUBLE) AS s00, l1 AS s01, l2 AS s02,
        |    l1*l1 AS s11, l1*l2 AS s12, l2*l2 AS s22,
        |    y AS t0, l1*y AS t1, l2*y AS t2
        |  FROM rows3 WHERE rz = 3
        |  UNION ALL
        |  SELECT r.ticker, r.rz,
        |    a.s00 + CAST(1 AS DOUBLE), a.s01 + r.l1, a.s02 + r.l2,
        |    a.s11 + r.l1*r.l1, a.s12 + r.l1*r.l2, a.s22 + r.l2*r.l2,
        |    a.t0 + r.y, a.t1 + r.l1*r.y, a.t2 + r.l2*r.y
        |  FROM rows3 r JOIN acc a ON r.ticker = a.ticker AND r.rz = a.rz + 1),
        |nf AS MATERIALIZED (
        |  SELECT a.* FROM acc a
        |  JOIN (SELECT ticker, MAX(rz) AS mx FROM rows3 GROUP BY 1) m
        |    ON a.ticker = m.ticker AND a.rz = m.mx),
        |c1 AS (SELECT *, sqrt(s00) AS l00 FROM nf),
        |c2 AS (SELECT *, s01 / l00 AS l10, s02 / l00 AS l20 FROM c1),
        |c3 AS (SELECT *, sqrt(s11 - l10*l10) AS l11 FROM c2),
        |c4 AS (SELECT *, (s12 - l20*l10) / l11 AS l21 FROM c3),
        |c5 AS (SELECT *, sqrt((s22 - l20*l20) - l21*l21) AS l22 FROM c4),
        |f0 AS (SELECT *, t0 / l00 AS w0 FROM c5),
        |f1 AS (SELECT *, (t1 - l10*w0) / l11 AS w1 FROM f0),
        |f2 AS (SELECT *, ((t2 - l20*w0) - l21*w1) / l22 AS w2 FROM f1),
        |k2 AS (SELECT *, w2 / l22 AS b2 FROM f2),
        |k1 AS (SELECT *, (w1 - l21*b2) / l11 AS b1 FROM k2),
        |k0 AS MATERIALIZED (SELECT *, ((w0 - l10*b1) - l20*b2) / l00 AS b0 FROM k1),
        |rs AS (
        |  SELECT r.ticker, r.rz,
        |    (r.y - ((k.b0 + r.l1*k.b1) + r.l2*k.b2))
        |      * (r.y - ((k.b0 + r.l1*k.b1) + r.l2*k.b2)) AS rss
        |  FROM rows3 r JOIN k0 k ON r.ticker = k.ticker WHERE r.rz = 3
        |  UNION ALL
        |  SELECT r.ticker, r.rz,
        |    rs.rss + (r.y - ((k.b0 + r.l1*k.b1) + r.l2*k.b2))
        |      * (r.y - ((k.b0 + r.l1*k.b1) + r.l2*k.b2))
        |  FROM rows3 r
        |  JOIN rs ON r.ticker = rs.ticker AND r.rz = rs.rz + 1
        |  JOIN k0 k ON r.ticker = k.ticker),
        |sg AS (
        |  SELECT a.ticker, f.rss, a.s00
        |  FROM nf a JOIN rs f ON a.ticker = f.ticker AND f.rz = a.rz),
        |lastz AS (
        |  SELECT z.ticker,
        |    MAX(CASE WHEN z.rz = nn.n - 1 THEN z.z END) AS xa,
        |    MAX(CASE WHEN z.rz = nn.n - 2 THEN z.z END) AS xb
        |  FROM zz z JOIN nn ON z.ticker = nn.ticker
        |  WHERE z.rz IN (nn.n - 1, nn.n - 2)
        |  GROUP BY 1),
        |fc AS (
        |  SELECT k.ticker, 1 AS h, k.b0 + (k.b1*l.xa + k.b2*l.xb) AS p,
        |         l.xa AS prev,
        |         ms.c_n + (k.b0 + (k.b1*l.xa + k.b2*l.xb)) AS lvl
        |  FROM k0 k
        |  JOIN lastz l ON k.ticker = l.ticker
        |  JOIN mstat ms ON k.ticker = ms.ticker
        |  UNION ALL
        |  SELECT f.ticker, f.h + 1,
        |         k.b0 + (k.b1*f.p + k.b2*f.prev), f.p,
        |         f.lvl + (k.b0 + (k.b1*f.p + k.b2*f.prev))
        |  FROM fc f JOIN k0 k ON f.ticker = k.ticker WHERE f.h < 5)
        |SELECT f.ticker, dch.d, f.h AS horizon_step, f.lvl AS mu,
        |  f.lvl - CAST(1.959963984540054 AS DOUBLE)
        |    * sqrt(GREATEST(CAST(1e-12 AS DOUBLE), g.rss / g.s00) * f.h) AS lo,
        |  f.lvl + CAST(1.959963984540054 AS DOUBLE)
        |    * sqrt(GREATEST(CAST(1e-12 AS DOUBLE), g.rss / g.s00) * f.h) AS hi
        |FROM fc f
        |JOIN sg g ON f.ticker = g.ticker
        |JOIN dch ON f.ticker = dch.ticker""".stripMargin,

    // Replays Exog end-to-end. The exog columns (linear index rn,
    // weekday rn%7) have integer-exact sums — plain SUMs replay the
    // kernel's double accumulation bit-for-bit — while every sum
    // involving prices walks recA ascending rn exactly like normalEq's
    // row loop. Cholesky (4×4 ARX, 2×2 per VIF regression), the
    // forward/back substitutions, both VIF R² clamps, σ² and the
    // Gaussian-likelihood AIC, and the 3-step recursive forecast all
    // replay in the kernel's IEEE op order (LN/PI() agree with Java's
    // Math.log/Math.PI to the ulp the round-9 hash absorbs).
    "q170_exog_arx" -> {
      val D = "CAST(1.0 AS DOUBLE)"
      // ARX residual fit expression — the kernel's ascending-j dot
      def arxFit = s"(((ab.be0 + w.ly * ab.be1) + w.x1 * ab.be2) + w.x2 * ab.be3)"
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |sel0 AS (
         |  SELECT ticker, price,
         |    row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS rn
         |  FROM bars QUALIFY rn <= 60),
         |ok AS (SELECT ticker FROM sel0 GROUP BY ticker
         |       HAVING COUNT(*) = 60 AND MIN(price) < MAX(price)),
         |sel2 AS MATERIALIZED (SELECT sel0.* FROM sel0 JOIN ok USING (ticker)),
         |ints AS MATERIALIZED (
         |  SELECT ticker,
         |    CAST(COUNT(CASE WHEN rn >= 2 THEN 1 END) AS DOUBLE) AS m,
         |    CAST(SUM(CASE WHEN rn >= 2 THEN rn END) AS DOUBLE) AS sx1,
         |    CAST(SUM(CASE WHEN rn >= 2 THEN rn % 7 END) AS DOUBLE) AS sx2,
         |    CAST(SUM(CASE WHEN rn >= 2 THEN rn * rn END) AS DOUBLE) AS s11,
         |    CAST(SUM(CASE WHEN rn >= 2 THEN rn * (rn % 7) END) AS DOUBLE) AS s12,
         |    CAST(SUM(CASE WHEN rn >= 2 THEN (rn % 7) * (rn % 7) END) AS DOUBLE) AS s22,
         |    CAST(SUM(rn) AS DOUBLE) AS vx1,
         |    CAST(SUM(rn % 7) AS DOUBLE) AS vx2,
         |    CAST(SUM(rn * rn) AS DOUBLE) AS v11,
         |    CAST(SUM(rn * (rn % 7)) AS DOUBLE) AS v12,
         |    CAST(SUM((rn % 7) * (rn % 7)) AS DOUBLE) AS v22
         |  FROM sel2 GROUP BY ticker),
         |arxrow AS MATERIALIZED (
         |  SELECT a.ticker, a.rn, a.price AS yv, b.price AS ly,
         |    CAST(a.rn AS DOUBLE) AS x1, CAST(a.rn % 7 AS DOUBLE) AS x2
         |  FROM sel2 a JOIN sel2 b ON b.ticker = a.ticker AND b.rn = a.rn - 1),
         |recA AS (
         |  SELECT ticker, 1 AS rn,
         |    CAST(0.0 AS DOUBLE) AS sl, CAST(0.0 AS DOUBLE) AS sll,
         |    CAST(0.0 AS DOUBLE) AS slx1, CAST(0.0 AS DOUBLE) AS slx2,
         |    CAST(0.0 AS DOUBLE) AS ty, CAST(0.0 AS DOUBLE) AS tyl,
         |    CAST(0.0 AS DOUBLE) AS tyx1, CAST(0.0 AS DOUBLE) AS tyx2
         |  FROM ok
         |  UNION ALL
         |  SELECT r.ticker, a.rn,
         |    r.sl + a.ly, r.sll + a.ly * a.ly,
         |    r.slx1 + a.ly * a.x1, r.slx2 + a.ly * a.x2,
         |    r.ty + a.yv, r.tyl + a.ly * a.yv,
         |    r.tyx1 + a.x1 * a.yv, r.tyx2 + a.x2 * a.yv
         |  FROM recA r JOIN arxrow a ON a.ticker = r.ticker AND a.rn = r.rn + 1),
         |amat AS (
         |  SELECT recA.*, ints.m, ints.sx1, ints.sx2, ints.s11, ints.s12,
         |    ints.s22, ints.vx1, ints.vx2, ints.v11, ints.v12, ints.v22
         |  FROM recA JOIN ints USING (ticker) WHERE recA.rn = 60),
         |c1 AS (SELECT *, SQRT(m) AS l00 FROM amat),
         |c2 AS (SELECT *, sl / l00 AS l10, sx1 / l00 AS l20, sx2 / l00 AS l30 FROM c1),
         |c3 AS (SELECT *, SQRT(sll - l10 * l10) AS l11 FROM c2),
         |c4 AS (SELECT *, (slx1 - l20 * l10) / l11 AS l21,
         |                 (slx2 - l30 * l10) / l11 AS l31 FROM c3),
         |c5 AS (SELECT *, SQRT((s11 - l20 * l20) - l21 * l21) AS l22 FROM c4),
         |c6 AS (SELECT *, ((s12 - l30 * l20) - l31 * l21) / l22 AS l32 FROM c5),
         |c7 AS (SELECT *, SQRT(((s22 - l30 * l30) - l31 * l31) - l32 * l32) AS l33 FROM c6),
         |f1 AS (SELECT *, ty / l00 AS fy0 FROM c7),
         |f2 AS (SELECT *, (tyl - l10 * fy0) / l11 AS fy1 FROM f1),
         |f3 AS (SELECT *, ((tyx1 - l20 * fy0) - l21 * fy1) / l22 AS fy2 FROM f2),
         |f4 AS (SELECT *, (((tyx2 - l30 * fy0) - l31 * fy1) - l32 * fy2) / l33 AS fy3 FROM f3),
         |g4 AS (SELECT *, fy3 / l33 AS be3 FROM f4),
         |g3 AS (SELECT *, (fy2 - l32 * be3) / l22 AS be2 FROM g4),
         |g2 AS (SELECT *, ((fy1 - l21 * be2) - l31 * be3) / l11 AS be1 FROM g3),
         |g1 AS (SELECT *, (((fy0 - l10 * be1) - l20 * be2) - l30 * be3) / l00 AS be0 FROM g2),
         |v1a AS (SELECT *, SQRT(CAST(60.0 AS DOUBLE)) AS p00 FROM g1),
         |v1b AS (SELECT *, vx2 / p00 AS p10 FROM v1a),
         |v1c AS (SELECT *, SQRT(v22 - p10 * p10) AS p11 FROM v1b),
         |v1d AS (SELECT *, vx1 / p00 AS q0 FROM v1c),
         |v1e AS (SELECT *, (v12 - p10 * q0) / p11 AS q1 FROM v1d),
         |v1f AS (SELECT *, q1 / p11 AS a1 FROM v1e),
         |v1g AS (SELECT *, (q0 - p10 * a1) / p00 AS a0 FROM v1f),
         |v2a AS (SELECT *, vx1 / p00 AS r10 FROM v1g),
         |v2b AS (SELECT *, SQRT(v11 - r10 * r10) AS r11 FROM v2a),
         |v2c AS (SELECT *, vx2 / p00 AS u0 FROM v2b),
         |v2d AS (SELECT *, (v12 - r10 * u0) / r11 AS u1 FROM v2c),
         |v2e AS (SELECT *, u1 / r11 AS cc1 FROM v2d),
         |v2f AS (SELECT *, (u0 - r10 * cc1) / p00 AS cc0 FROM v2e),
         |allb AS MATERIALIZED (SELECT *, vx1 / 60 AS my1, vx2 / 60 AS my2 FROM v2f),
         |rowsb AS MATERIALIZED (
         |  SELECT s.ticker, s.rn, s.price AS yv,
         |    CAST(s.rn AS DOUBLE) AS x1, CAST(s.rn % 7 AS DOUBLE) AS x2,
         |    l.price AS ly
         |  FROM sel2 s LEFT JOIN sel2 l
         |    ON l.ticker = s.ticker AND l.rn = s.rn - 1),
         |recB AS (
         |  SELECT ticker, 0 AS rn,
         |    CAST(0.0 AS DOUBLE) AS st1, CAST(0.0 AS DOUBLE) AS sr1,
         |    CAST(0.0 AS DOUBLE) AS st2, CAST(0.0 AS DOUBLE) AS sr2,
         |    CAST(0.0 AS DOUBLE) AS sarx
         |  FROM ok
         |  UNION ALL
         |  SELECT r.ticker, w.rn,
         |    r.st1 + (w.x1 - ab.my1) * (w.x1 - ab.my1),
         |    r.sr1 + (w.x1 - (ab.a0 + w.x2 * ab.a1))
         |          * (w.x1 - (ab.a0 + w.x2 * ab.a1)),
         |    r.st2 + (w.x2 - ab.my2) * (w.x2 - ab.my2),
         |    r.sr2 + (w.x2 - (ab.cc0 + w.x1 * ab.cc1))
         |          * (w.x2 - (ab.cc0 + w.x1 * ab.cc1)),
         |    r.sarx + CASE WHEN w.rn >= 2
         |      THEN (w.yv - $arxFit) * (w.yv - $arxFit)
         |      ELSE CAST(0.0 AS DOUBLE) END
         |  FROM recB r
         |  JOIN rowsb w ON w.ticker = r.ticker AND w.rn = r.rn + 1
         |  JOIN allb ab ON ab.ticker = r.ticker),
         |fin AS MATERIALIZED (
         |  SELECT b.*, ab.be0, ab.be1, ab.be2, ab.be3, ab.m,
         |    GREATEST(CAST(1e-12 AS DOUBLE), b.sarx / ab.m) AS sigma2
         |  FROM recB b JOIN allb ab USING (ticker) WHERE b.rn = 60),
         |lastp AS (SELECT ticker, price AS y60 FROM sel2 WHERE rn = 60),
         |mus AS (
         |  SELECT f.ticker,
         |    ((f.be0 + lp.y60 * f.be1) + CAST(61.0 AS DOUBLE) * f.be2)
         |      + CAST(5.0 AS DOUBLE) * f.be3 AS mu1
         |  FROM fin f JOIN lastp lp USING (ticker)),
         |mus2 AS (
         |  SELECT m1.ticker,  m1.mu1,
         |    ((f.be0 + m1.mu1 * f.be1) + CAST(62.0 AS DOUBLE) * f.be2)
         |      + CAST(6.0 AS DOUBLE) * f.be3 AS mu2
         |  FROM mus m1 JOIN fin f USING (ticker)),
         |mus3 AS (
         |  SELECT m2.ticker, m2.mu1, m2.mu2,
         |    ((f.be0 + m2.mu2 * f.be1) + CAST(63.0 AS DOUBLE) * f.be2)
         |      + CAST(0.0 AS DOUBLE) * f.be3 AS mu3
         |  FROM mus2 m2 JOIN fin f USING (ticker))
         |SELECT f.ticker, f.be0 AS icept, f.be1 AS ar1, f.be2 AS b1,
         |  f.be3 AS b2, f.sigma2,
         |  CAST(2.0 AS DOUBLE) * 5 - CAST(2.0 AS DOUBLE) *
         |    ((CAST(-0.5 AS DOUBLE) * f.m)
         |     * (LN((CAST(2.0 AS DOUBLE) * PI()) * f.sigma2) + $D)) AS aic,
         |  $D / ($D - LEAST($D - CAST(1e-12 AS DOUBLE),
         |    GREATEST(CAST(0.0 AS DOUBLE), $D - f.sr1 / f.st1))) AS vif1,
         |  $D / ($D - LEAST($D - CAST(1e-12 AS DOUBLE),
         |    GREATEST(CAST(0.0 AS DOUBLE), $D - f.sr2 / f.st2))) AS vif2,
         |  CAST(2 AS INT) AS kept_n, m3.mu1, m3.mu2, m3.mu3
         |FROM fin f JOIN mus3 m3 USING (ticker)""".stripMargin
    },

    // Replays RegimeDetector.detect float-for-float: P1/P2 carry every
    // mean-pass / centered-pass sequential sum (returns, trend window,
    // the 19 Hurst lag-diff series) ascending rn exactly like the
    // kernel's Array.sum folds; the 51 rolling-10 vols are explicit
    // left-associated 10-term adds; the Hurst log-log OLS walks lags
    // 2..20 in order; skew/kurt replay the kernel's (z·z)·z and
    // (z·z)·(z·z) products; the rule tree and model recommendations are
    // the same closed-form CASE.
    "q172_regime_detect" -> {
      val D0 = "CAST(0.0 AS DOUBLE)"
      def nestSum(terms: Seq[String]) = terms.reduceLeft((a, b) => s"($a + $b)")
      val lags = 2 to 20
      val lagSel = lags.map(l => s"lag(price, $l) OVER w AS pl$l").mkString(", ")
      val leadSel = (1 to 9).map(j => s"lead(r, $j) OVER w2 AS r$j").mkString(", ")
      val mwTerms = "r" +: (1 to 9).map(j => s"r$j")
      val mwExpr = s"(${nestSum(mwTerms)}) / 10"
      val ssExpr = nestSum(mwTerms.map(t => s"(($t - mw) * ($t - mw))"))
      val p1Base = lags.map(l => s"$D0 AS h$l").mkString(", ")
      val p1Step = lags.map(l =>
        s"p1.h$l + CASE WHEN q.rn > $l THEN (q.price - q.pl$l) ELSE $D0 END AS h$l")
        .mkString(",\n    ")
      val meansSel = lags.map(l => s"h$l / ${180 - l} AS ml$l").mkString(", ")
      val p2Base = lags.map(l => s"$D0 AS sl$l").mkString(", ")
      val p2Step = lags.map(l =>
        s"""p2.sl$l + CASE WHEN q.rn > $l
           | THEN ((q.price - q.pl$l) - mn.ml$l) * ((q.price - q.pl$l) - mn.ml$l)
           | ELSE $D0 END AS sl$l""".stripMargin.replace("\n", ""))
        .mkString(",\n    ")
      val logsdSel = lags.map(l =>
        s"LN(GREATEST(SQRT(p2.sl$l / ${180 - l - 1}), CAST(1e-12 AS DOUBLE))) AS g$l")
        .mkString(",\n    ")
      val gCase = lags.map(l => s"WHEN $l THEN g$l").mkString(" ")
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |sel0 AS (
         |  SELECT ticker, price,
         |    row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS rn
         |  FROM bars QUALIFY rn <= 180),
         |ok AS (SELECT ticker FROM sel0 GROUP BY ticker
         |       HAVING COUNT(*) = 180 AND MIN(price) < MAX(price)),
         |rows_ AS MATERIALIZED (
         |  SELECT s.ticker, s.rn, s.price,
         |    s.price / lag(s.price, 1) OVER w - 1 AS r, $lagSel
         |  FROM (SELECT sel0.* FROM sel0 JOIN ok USING (ticker)) s
         |  WINDOW w AS (PARTITION BY s.ticker ORDER BY s.rn)),
         |rva AS (
         |  SELECT * FROM (
         |    SELECT ticker, rn, r, $leadSel
         |    FROM (SELECT ticker, rn, r FROM rows_ WHERE r IS NOT NULL)
         |    WINDOW w2 AS (PARTITION BY ticker ORDER BY rn))
         |  WHERE rn BETWEEN 121 AND 171),
         |rvb AS (SELECT ticker, rn, ${mwTerms.mkString(", ")}, $mwExpr AS mw FROM rva),
         |rv10 AS MATERIALIZED (
         |  SELECT ticker, rn, SQRT(($ssExpr) / 9) AS stdw FROM rvb),
         |p1 AS (
         |  SELECT ticker, 0 AS rn, $D0 AS sr, $D0 AS sy, $D0 AS sv, $p1Base
         |  FROM ok
         |  UNION ALL
         |  SELECT p1.ticker, q.rn,
         |    p1.sr + CASE WHEN q.rn >= 121 THEN q.r ELSE $D0 END,
         |    p1.sy + CASE WHEN q.rn >= 121 THEN q.price ELSE $D0 END,
         |    p1.sv + CASE WHEN v.stdw IS NOT NULL THEN v.stdw ELSE $D0 END,
         |    $p1Step
         |  FROM p1
         |  JOIN rows_ q ON q.ticker = p1.ticker AND q.rn = p1.rn + 1
         |  LEFT JOIN rv10 v ON v.ticker = p1.ticker AND v.rn = q.rn),
         |means AS MATERIALIZED (
         |  SELECT ticker, sr / 60 AS mrec, sy / 60 AS my, sv / 51 AS mv,
         |    $meansSel
         |  FROM p1 WHERE rn = 180),
         |p2 AS (
         |  SELECT ticker, 0 AS rn, $D0 AS ssr, $D0 AS sxy, $D0 AS sxx,
         |    $D0 AS syy, $D0 AS ssv, $p2Base
         |  FROM ok
         |  UNION ALL
         |  SELECT p2.ticker, q.rn,
         |    p2.ssr + CASE WHEN q.rn >= 121
         |      THEN (q.r - mn.mrec) * (q.r - mn.mrec) ELSE $D0 END,
         |    p2.sxy + CASE WHEN q.rn >= 121
         |      THEN (CAST(q.rn - 121 AS DOUBLE) - CAST(29.5 AS DOUBLE))
         |           * (q.price - mn.my) ELSE $D0 END,
         |    p2.sxx + CASE WHEN q.rn >= 121
         |      THEN (CAST(q.rn - 121 AS DOUBLE) - CAST(29.5 AS DOUBLE))
         |           * (CAST(q.rn - 121 AS DOUBLE) - CAST(29.5 AS DOUBLE))
         |      ELSE $D0 END,
         |    p2.syy + CASE WHEN q.rn >= 121
         |      THEN (q.price - mn.my) * (q.price - mn.my) ELSE $D0 END,
         |    p2.ssv + CASE WHEN v.stdw IS NOT NULL
         |      THEN (v.stdw - mn.mv) * (v.stdw - mn.mv) ELSE $D0 END,
         |    $p2Step
         |  FROM p2
         |  JOIN rows_ q ON q.ticker = p2.ticker AND q.rn = p2.rn + 1
         |  JOIN means mn ON mn.ticker = p2.ticker
         |  LEFT JOIN rv10 v ON v.ticker = p2.ticker AND v.rn = q.rn),
         |scal AS MATERIALIZED (
         |  SELECT p2.ticker,
         |    SQRT(p2.ssr / 59) * SQRT(CAST(252.0 AS DOUBLE)) AS rv,
         |    SQRT(p2.ssv / 50) AS vov,
         |    p2.sxy / p2.sxx AS slope,
         |    (p2.sxy * p2.sxy) / (p2.sxx * p2.syy) AS r2,
         |    GREATEST(SQRT(p2.ssr / 59), CAST(1e-12 AS DOUBLE)) AS sd,
         |    mn.mrec,
         |    $logsdSel
         |  FROM p2 JOIN means mn USING (ticker) WHERE p2.rn = 180),
         |gl AS MATERIALIZED (
         |  SELECT ticker, l, LN(CAST(l AS DOUBLE)) AS xv,
         |    CASE l $gCase END AS gv
         |  FROM scal CROSS JOIN (SELECT UNNEST(range(2, 21)) AS l)),
         |ha AS (
         |  SELECT ticker, 1 AS l, $D0 AS sx, $D0 AS sg FROM ok
         |  UNION ALL
         |  SELECT ha.ticker, g.l, ha.sx + g.xv, ha.sg + g.gv
         |  FROM ha JOIN gl g ON g.ticker = ha.ticker AND g.l = ha.l + 1),
         |hm AS MATERIALIZED (
         |  SELECT ticker, sx / 19 AS mx, sg / 19 AS myh FROM ha WHERE l = 20),
         |hb AS (
         |  SELECT ticker, 1 AS l, $D0 AS hxy, $D0 AS hxx FROM ok
         |  UNION ALL
         |  SELECT hb.ticker, g.l,
         |    hb.hxy + (g.xv - m.mx) * (g.gv - m.myh),
         |    hb.hxx + (g.xv - m.mx) * (g.xv - m.mx)
         |  FROM hb
         |  JOIN gl g ON g.ticker = hb.ticker AND g.l = hb.l + 1
         |  JOIN hm m ON m.ticker = hb.ticker),
         |hf AS MATERIALIZED (
         |  SELECT ticker, hxy / hxx AS hurst FROM hb WHERE l = 20),
         |p3 AS (
         |  SELECT ticker, 120 AS rn, $D0 AS sk, $D0 AS ku FROM ok
         |  UNION ALL
         |  SELECT p3.ticker, q.rn,
         |    p3.sk + (((q.r - sc.mrec) / sc.sd) * ((q.r - sc.mrec) / sc.sd))
         |            * ((q.r - sc.mrec) / sc.sd),
         |    p3.ku + (((q.r - sc.mrec) / sc.sd) * ((q.r - sc.mrec) / sc.sd))
         |            * (((q.r - sc.mrec) / sc.sd) * ((q.r - sc.mrec) / sc.sd))
         |  FROM p3
         |  JOIN rows_ q ON q.ticker = p3.ticker AND q.rn = p3.rn + 1
         |  JOIN scal sc ON sc.ticker = p3.ticker),
         |mom AS (SELECT ticker, sk / 60 AS skew, ku / 60 AS kurt
         |  FROM p3 WHERE rn = 180)
         |SELECT s.ticker,
         |  CASE
         |    WHEN s.rv > CAST(0.45 AS DOUBLE) AND m.kurt > 5 THEN 'CRISIS'
         |    WHEN s.rv > CAST(0.30 AS DOUBLE) THEN 'HIGH_VOLATILITY'
         |    WHEN s.r2 > CAST(0.6 AS DOUBLE) AND h.hurst > CAST(0.55 AS DOUBLE)
         |      THEN 'STRONG_TRENDING'
         |    WHEN s.r2 > CAST(0.3 AS DOUBLE) THEN 'MODERATE_TRENDING'
         |    WHEN h.hurst < CAST(0.45 AS DOUBLE) THEN 'MEAN_REVERTING'
         |    ELSE 'RANGING' END AS regime,
         |  CASE
         |    WHEN s.rv > CAST(0.45 AS DOUBLE) AND m.kurt > 5
         |      THEN CAST(0.9 AS DOUBLE)
         |    WHEN s.rv > CAST(0.30 AS DOUBLE) THEN CAST(0.8 AS DOUBLE)
         |    WHEN s.r2 > CAST(0.6 AS DOUBLE) AND h.hurst > CAST(0.55 AS DOUBLE)
         |      THEN CAST(0.85 AS DOUBLE)
         |    WHEN s.r2 > CAST(0.3 AS DOUBLE) THEN CAST(0.7 AS DOUBLE)
         |    WHEN h.hurst < CAST(0.45 AS DOUBLE) THEN CAST(0.7 AS DOUBLE)
         |    ELSE CAST(0.6 AS DOUBLE) END AS conf,
         |  s.rv, s.vov, s.r2 AS trend_r2, s.slope AS trend_slope,
         |  h.hurst, m.skew, m.kurt,
         |  CASE
         |    WHEN s.rv > CAST(0.45 AS DOUBLE) AND m.kurt > 5
         |      THEN 'GARCH,MSSA_RL'
         |    WHEN s.rv > CAST(0.30 AS DOUBLE) THEN 'GARCH,SAMOSSA'
         |    WHEN s.r2 > CAST(0.6 AS DOUBLE) AND h.hurst > CAST(0.55 AS DOUBLE)
         |      THEN 'SARIMAX,SAMOSSA'
         |    WHEN s.r2 > CAST(0.3 AS DOUBLE) THEN 'SARIMAX,ENSEMBLE'
         |    WHEN h.hurst < CAST(0.45 AS DOUBLE) THEN 'SAMOSSA,SARIMAX'
         |    ELSE 'ENSEMBLE' END AS models
         |FROM scal s
         |JOIN hf h USING (ticker)
         |JOIN mom m USING (ticker)""".stripMargin
    }
  )
}
