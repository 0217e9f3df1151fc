package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.forecast.MonteCarlo
import graft.signals.SignalGenerator

/** Monte Carlo simulation and the signal decision core under the oracle
  * gate (reference forcester_ts/monte_carlo_simulator.py:19-190,
  * models/time_series_signal_generator.py:176-4289).
  *
  * q159 runs the REAL [[MonteCarlo.simulate]] with its pluggable shock
  * source swapped for a minstd-LCG (pure integer arithmetic + one double
  * division — replayable bit-exactly in any engine; the default seeded
  * Gaussian stays spec-verified, its Marsaglia rejection loop has no SQL
  * replay). Emitted stats are order statistics and counts — exact.
  *
  * q160 runs the REAL [[SignalGenerator.generate]] per (ticker, day):
  * friction ladder (microstructure / bid-ask / default arms — the LOB
  * arm needs exp() and stays spec-verified), SNR gate, confidence core,
  * risk score, ATR stop/target with R:R enforcement, and the hold-reason
  * taxonomy. Every input is derived deterministically from day-bucket
  * aggregates, so the whole scalar chain is identical IEEE in DuckDB.
  */
object SignalQueries extends QueryModule {

  /** Two minstd (Park–Miller) steps from a (path, step) counter; uniform
    * mapped to a clipped-range shock in (−2, 2). Products stay ≤
    * 16807·2^31 ≪ 2^63 — exact in BIGINT on both engines. */
  private[queries] def lcgShock(p: Int, h: Int): Double = {
    val k = p.toLong * 5L + h + 1L
    val s1 = (16807L * k) % 2147483647L
    val s2 = (16807L * s1) % 2147483647L
    ((s2.toDouble / 2147483647.0) - 0.5) * 4.0
  }

  override def queries: Map[String, QFn] = Map(
    // per-ticker MC bands: 200 paths × 5 steps through the real price
    // recursion max(1e-9, p·(1+drift+vol·shock)); p05/median/p95 are
    // exact order statistics, probUp an exact count ratio
    "q159_montecarlo_bands" -> ((s, dir) => {
      import s.implicits._
      Bars.of(s, dir).groupBy($"ticker")
        .agg(Det.davg($"price").as("lp"), Det.dstddev($"price").as("sd"))
        .select($"ticker", $"lp", $"sd")
        .as[(String, Double, Double)]
        .flatMap { case (t, lp, sd) =>
          val g = sd / lp / 50.0
          val v = sd / lp / 20.0
          val fc = Array.tabulate(5)(h => lp * (1 + g * (h + 1)))
          val vol = Array.fill(5)(v)
          val sum = MonteCarlo.simulate(lp, fc, vol, nPaths = 200,
            shock = Some(lcgShock))
          (0 until 5).map(h =>
            (t, h + 1, sum.p05(h), sum.median(h), sum.p95(h), sum.probUp))
        }
        .toDF("ticker", "h", "p05", "median", "p95", "prob_up")
    }),

    // the decision core over (ticker, day) aggregates; the day index di
    // steers deterministic branch coverage: friction arms (di%4),
    // degenerate CI → NaN SNR (di%11), vol damping (di%5), agreement /
    // diagnostics grids (di%6, di%7), forecast direction (di%7 − 3)
    "q160_signal_rules" -> ((s, dir) => {
      import s.implicits._
      val byDay = Bars.of(s, dir)
        .groupBy($"ticker", $"day")
        .agg(Det.davg($"price").as("lp"),
          (max($"price") - min($"price")).as("atr"))
        .withColumn("di", row_number()
          .over(Window.partitionBy($"ticker").orderBy($"day")).cast("int"))
        .select($"ticker", $"day", $"lp", $"atr", $"di")
      byDay.as[(String, java.sql.Timestamp, Double, Double, Int)]
        .map { case (t, day, lp, atr, di) =>
          val g = (di % 7 - 3) * 0.01
          val f5 = lp * (1 + g)
          val ciw = if (di % 11 == 0) 0.0 else lp * 0.005 * (1 + di % 3)
          val v0 = 0.002 * (di % 5)
          val sig = SignalGenerator.generate(SignalGenerator.Inputs(
            ticker = t, date = day, lastPrice = lp, atr = atr,
            forecast = Array.fill(5)(f5),
            lowerCi = Array.fill(5)(f5 - ciw),
            upperCi = Array.fill(5)(f5 + ciw),
            vol = Array.fill(5)(v0),
            modelAgreement = 0.5 + 0.1 * (di % 6),
            diagnosticsScore = 0.4 + 0.1 * (di % 7),
            probUp = 0.5,
            bid = if (di % 4 == 1) lp * 0.999 else Double.NaN,
            ask = if (di % 4 == 1) lp * 1.001 else Double.NaN,
            txnCostBps = if (di % 4 == 0) 5.0 + (di % 3) else Double.NaN,
            impactBps = 2.0,
            assetClass = t match {
              case "click" => "FX"
              case "view" => "CRYPTO"
              case "signup" => "EQUITY"
              case _ => "UNKNOWN"
            }),
            // a stricter risk budget on every 9th day exercises the
            // RISK_TOO_HIGH arm (unreachable under the default 0.75
            // with conf ≥ 0.45: high vol/CI deflates confidence first)
            cfg = if (di % 9 == 0)
              SignalGenerator.Config(maxRisk = 0.02)
            else SignalGenerator.Config())
          (sig.ticker, sig.date, sig.action, sig.confidence,
            sig.expectedReturn, sig.riskScore, sig.entryPrice,
            sig.stopLoss, sig.takeProfit, sig.holdReason)
        }
        .toDF("ticker", "date", "action", "confidence", "expected_return",
          "risk_score", "entry_price", "stop_loss", "take_profit",
          "hold_reason")
    }),

    // the REAL SignalRouter.Router per ticker (reference
    // models/signal_router.py:68-479): ordered fallback chain with
    // feature flags and attempt/served stats. Routes are deterministic
    // functions of per-ticker aggregates — ts enabled on odd ranks and
    // serving only above the price threshold, the fallback serving only
    // the first three ranks, HOLD-everything when neither fires — so
    // the dispatch, the short-circuit, and both counters replay as
    // closed-form CASE logic.
    "q169_signal_router" -> ((s, dir) => {
      import s.implicits._
      val dim = Bars.of(s, dir).groupBy($"ticker")
        .agg(Det.davg($"price").as("lp"))
        .withColumn("ti",
          row_number().over(Window.orderBy($"ticker")).cast("int"))
        .select($"ticker", $"lp", $"ti")
      dim.as[(String, Double, Int)].map { case (t, lp, ti) =>
        def mk(nm: String, en: Boolean)(g: => Option[graft.domain.Signal]) =
          new graft.signals.SignalRouter.Route {
            val name = nm
            val enabled = en
            def generate(ticker: String) = g
          }
        val ts = mk("ts", ti % 2 == 1)(
          if (lp > 100.0)
            Some(graft.domain.Signal(t, new java.sql.Timestamp(0L), "BUY",
              lp / (lp + 1.0), 0.0, 0.0, lp, 0.0, 0.0, ""))
          else None)
        val llm = mk("llm_fallback", en = true)(
          if (ti <= 3)
            Some(graft.domain.Signal(t, new java.sql.Timestamp(0L), "HOLD",
              0.25, 0.0, 0.0, lp, 0.0, 0.0, "LLM_LOW_CONV"))
          else None)
        val router = new graft.signals.SignalRouter.Router(Seq(ts, llm))
        val (sig, served) = router.route(t)
        val st = router.stats
        (t, served, sig.action, sig.confidence,
          st.attempts.getOrElse("ts", 0L),
          st.attempts.getOrElse("llm_fallback", 0L),
          st.served.getOrElse("default_hold", 0L))
      }.toDF("ticker", "served_by", "action", "confidence",
        "att_ts", "att_llm", "held")
    }),

    // The classifier SCORING contract under the hash gate (reference
    // directional_classifier.py:54-155). Training is MLlib-LBFGS (no SQL
    // replay — stays spec-covered); scoring from persisted coefficients
    // is pure arithmetic: sigmoid(plattA·(b + w·x) + plattB). The model
    // row is derived deterministically from per-ticker Det aggregates
    // (the persisted-coefficients stand-in the oracle can re-derive);
    // the day index steers every disable branch: di%13 → trained on 29
    // examples (< 30 ⇒ disabled), di%11 → feature-name mismatch
    // (silent wrong-column guard), di%7 → a feature missing from the
    // map (NaN margin ⇒ None). None surfaces as NULL p_up.
    "q179_directional_score" -> ((s, dir) => {
      import s.implicits._
      val byDay = Bars.of(s, dir)
        .groupBy($"ticker", $"day")
        .agg(Det.davg($"price").as("dp"),
          (max($"price") - min($"price")).as("atr"))
      val dim = Bars.of(s, dir).groupBy($"ticker")
        .agg(Det.davg($"price").as("lp"), Det.dstddev($"price").as("sd"))
      byDay.join(dim, "ticker")
        .withColumn("di", row_number()
          .over(Window.partitionBy($"ticker").orderBy($"day")).cast("int"))
        .select($"ticker", $"dp", $"atr", $"lp", $"sd", $"di")
        .as[(String, Double, Double, Double, Double, Int)]
        .map { case (t, dp, atr, lp, sd, di) =>
          val names = Seq("mom", "rng", "vol")
          val model = graft.ml.DirectionalClassifier.Model(
            featureCols = names,
            weights = Array(2.0 + sd / lp, -1.5, 0.5),
            intercept = -0.1,
            plattA = 1.0 + sd / lp,
            plattB = -0.05)
          val nTrain = if (di % 13 == 0) 29 else 200
          val current =
            if (di % 11 == 0) Seq("mom", "rng", "volume") else names
          val feats0 = Map(
            "mom" -> (dp / lp - 1.0),
            "rng" -> (atr / lp),
            "vol" -> (sd / lp))
          val feats = if (di % 7 == 0) feats0 - "vol" else feats0
          val p = graft.ml.DirectionalClassifier
            .scoreByName(model, nTrain, current)(feats)
          (t, di, p)
        }
        .toDF("ticker", "di", "p_up")
    })
  )

  override def oracles: Map[String, String] = Map(
    // the path recursion replayed in a recursive CTE carrying (ticker,
    // path, step, price); the LCG inlined on (p, step); band ranks
    // hardcoded for n=200: floor(0.05·199)=9, floor(0.5·199)=99,
    // floor(0.95·199)=189 (0-based) → rn 10/100/190
    "q159_montecarlo_bands" ->
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |aggs AS (
         |  SELECT ticker, ${Det.sqlAvg("price")} AS lp,
         |         ${Det.sqlStddev("price")} AS sd
         |  FROM bars GROUP BY ticker),
         |steps AS (SELECT UNNEST(range(1, 6)) AS h),
         |fc AS (
         |  SELECT a.ticker, s.h,
         |    a.lp * (1 + (a.sd / a.lp / CAST(50.0 AS DOUBLE)) * s.h) AS f,
         |    a.sd / a.lp / CAST(20.0 AS DOUBLE) AS v, a.lp
         |  FROM aggs a CROSS JOIN steps s),
         |drifts AS (
         |  SELECT ticker, h, v,
         |    f / COALESCE(lag(f) OVER (PARTITION BY ticker ORDER BY h), lp) - 1
         |      AS drift
         |  FROM fc),
         |paths AS (SELECT UNNEST(range(0, 200)) AS p),
         |rec AS (
         |  SELECT a.ticker, pp.p, 0 AS h, a.lp AS price
         |  FROM aggs a CROSS JOIN paths pp
         |  UNION ALL
         |  SELECT r.ticker, r.p, r.h + 1,
         |    GREATEST(CAST(1e-9 AS DOUBLE), r.price * (1 + d.drift + d.v *
         |      ((CAST((16807 * ((16807 * (r.p * 5 + r.h + 1)) % 2147483647))
         |            % 2147483647 AS DOUBLE)
         |        / CAST(2147483647 AS DOUBLE) - CAST(0.5 AS DOUBLE))
         |       * CAST(4.0 AS DOUBLE))))
         |  FROM rec r JOIN drifts d ON d.ticker = r.ticker AND d.h = r.h + 1),
         |ranked AS (
         |  SELECT ticker, h, price,
         |    row_number() OVER (PARTITION BY ticker, h ORDER BY price) AS rn
         |  FROM rec WHERE h >= 1),
         |bands AS (
         |  SELECT ticker, h,
         |    MAX(CASE WHEN rn = 10 THEN price END) AS p05,
         |    MAX(CASE WHEN rn = 100 THEN price END) AS median,
         |    MAX(CASE WHEN rn = 190 THEN price END) AS p95
         |  FROM ranked GROUP BY ticker, h),
         |pu AS (
         |  SELECT r.ticker,
         |    CAST(SUM(CASE WHEN r.price > a.lp THEN 1 ELSE 0 END) AS DOUBLE)
         |      / 200 AS prob_up
         |  FROM rec r JOIN aggs a ON a.ticker = r.ticker
         |  WHERE r.h = 5 GROUP BY r.ticker)
         |SELECT b.ticker, b.h, b.p05, b.median, b.p95, pu.prob_up
         |FROM bands b JOIN pu ON pu.ticker = b.ticker""".stripMargin,

    // the scalar decision chain replayed with Scala's exact operation
    // order; every fractional literal CAST to DOUBLE (a bare decimal
    // literal would make DuckDB fold mixed-integer arithmetic exactly
    // where Scala rounds through binary doubles)
    "q160_signal_rules" ->
      s"""${Bars.sql},
         |d1 AS (
         |  SELECT ticker, day, ${Det.sqlAvg("price")} AS lp,
         |         MAX(price) - MIN(price) AS atr
         |  FROM bars GROUP BY ticker, day),
         |d2 AS (
         |  SELECT ticker, day, lp, atr,
         |    CAST(row_number() OVER (PARTITION BY ticker ORDER BY day) AS INT) AS di
         |  FROM d1),
         |d3 AS (
         |  SELECT *,
         |    lp * (1 + (di % 7 - 3) * CAST(0.01 AS DOUBLE)) AS f5,
         |    CASE WHEN di % 11 = 0 THEN CAST(0.0 AS DOUBLE)
         |         ELSE lp * CAST(0.005 AS DOUBLE) * (1 + di % 3) END AS ciw,
         |    CAST(0.002 AS DOUBLE) * (di % 5) AS v0,
         |    CAST(0.5 AS DOUBLE) + CAST(0.1 AS DOUBLE) * (di % 6) AS agr,
         |    CAST(0.4 AS DOUBLE) + CAST(0.1 AS DOUBLE) * (di % 7) AS diag,
         |    CASE ticker WHEN 'click' THEN CAST(4.0 AS DOUBLE)
         |      WHEN 'view' THEN CAST(20.0 AS DOUBLE)
         |      ELSE CAST(10.0 AS DOUBLE) END AS defbps
         |  FROM d2),
         |d4 AS (
         |  SELECT *,
         |    CASE
         |      WHEN di % 4 = 0 THEN
         |        CAST(2.0 AS DOUBLE) * GREATEST(CAST(0.0 AS DOUBLE),
         |          (CAST(5.0 AS DOUBLE) + (di % 3)) + CAST(2.0 AS DOUBLE))
         |      WHEN di % 4 = 1 THEN
         |        GREATEST((lp * CAST(1.001 AS DOUBLE) - lp * CAST(0.999 AS DOUBLE))
         |          / (CAST(0.5 AS DOUBLE) * (lp * CAST(0.999 AS DOUBLE)
         |             + lp * CAST(1.001 AS DOUBLE))) * CAST(1e4 AS DOUBLE), defbps)
         |      ELSE defbps END AS frict,
         |    f5 / lp - 1 AS gross,
         |    f5 - ciw AS lo, f5 + ciw AS hi
         |  FROM d3),
         |d5 AS (
         |  SELECT *,
         |    GREATEST(CAST(0.0 AS DOUBLE), ABS(gross) - frict / CAST(1e4 AS DOUBLE))
         |      AS fnet,
         |    hi - lo AS width,
         |    GREATEST(CAST(1e-12 AS DOUBLE), (hi - lo) / 2) AS cih
         |  FROM d4),
         |d6 AS (
         |  SELECT *,
         |    (width > 0 AND
         |     ABS(gross) / (((width / CAST(2.0 AS DOUBLE)) / CAST(1.96 AS DOUBLE)) / lp)
         |       < CAST(1.5 AS DOUBLE)) AS snr_blocked
         |  FROM d5),
         |d7 AS (
         |  SELECT *,
         |    CASE WHEN snr_blocked THEN CAST(0.0 AS DOUBLE) ELSE fnet END AS net,
         |    SIGN(gross) AS dir,
         |    LEAST(CAST(1.0 AS DOUBLE), ABS(f5 - lp) / cih) AS snr_core,
         |    LEAST(CAST(1.0 AS DOUBLE), fnet / CAST(0.05 AS DOUBLE)) AS edge,
         |    CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(10.0 AS DOUBLE) * v0)
         |      AS volf
         |  FROM d6),
         |d8 AS (
         |  SELECT *,
         |    SIGN(gross) * net AS expret,
         |    GREATEST(CAST(0.0 AS DOUBLE), LEAST(CAST(1.0 AS DOUBLE),
         |      (CAST(0.2 AS DOUBLE) * diag + CAST(0.2 AS DOUBLE) * agr
         |       + CAST(0.2 AS DOUBLE) * snr_core + CAST(0.4 AS DOUBLE) * edge)
         |      * volf)) AS conf,
         |    LEAST(CAST(1.0 AS DOUBLE), CAST(5.0 AS DOUBLE) * v0
         |      + cih / GREATEST(lp, CAST(1e-9 AS DOUBLE))) AS risk,
         |    CAST(2.0 AS DOUBLE) * GREATEST(atr, CAST(1e-9 AS DOUBLE)) AS stopd,
         |    CASE WHEN SIGN(gross) <> 0 THEN SIGN(gross) ELSE CAST(1.0 AS DOUBLE) END
         |      AS dirl
         |  FROM d7)
         |SELECT ticker, day AS date,
         |  CASE
         |    WHEN conf < CAST(0.45 AS DOUBLE) THEN 'HOLD'
         |    WHEN net + CAST(1e-12 AS DOUBLE) < CAST(0.01 AS DOUBLE) THEN 'HOLD'
         |    WHEN risk > (CASE WHEN di % 9 = 0 THEN CAST(0.02 AS DOUBLE)
         |                      ELSE CAST(0.75 AS DOUBLE) END) THEN 'HOLD'
         |    WHEN expret > 0 THEN 'BUY'
         |    WHEN expret < 0 THEN 'SELL'
         |    ELSE 'HOLD' END AS action,
         |  conf AS confidence, expret AS expected_return, risk AS risk_score,
         |  lp AS entry_price,
         |  lp - dirl * stopd AS stop_loss,
         |  CASE WHEN ABS(f5 - lp) / stopd >= CAST(2.0 AS DOUBLE) THEN f5
         |       ELSE lp + dirl * CAST(2.0 AS DOUBLE) * stopd END AS take_profit,
         |  CASE
         |    WHEN conf < CAST(0.45 AS DOUBLE) THEN 'CONFIDENCE_BELOW_THRESHOLD'
         |    WHEN net + CAST(1e-12 AS DOUBLE) < CAST(0.01 AS DOUBLE)
         |      THEN (CASE WHEN snr_blocked THEN 'SNR_GATE' ELSE 'MIN_RETURN' END)
         |    WHEN risk > (CASE WHEN di % 9 = 0 THEN CAST(0.02 AS DOUBLE)
         |                      ELSE CAST(0.75 AS DOUBLE) END)
         |      THEN 'RISK_TOO_HIGH'
         |    WHEN expret > 0 THEN ''
         |    WHEN expret < 0 THEN ''
         |    ELSE 'ZERO_EXPECTED_RETURN' END AS hold_reason
         |FROM d8""".stripMargin,

    // the router chain as CASE dispatch: ts serves iff enabled (odd
    // rank) AND above threshold; llm serves iff reached and rank ≤ 3;
    // default_hold otherwise. att_ts counts the ENABLED attempt even
    // when ts yields nothing; att_llm counts iff the chain reached it.
    "q169_signal_router" ->
      s"""${Bars.sql},
         |dim AS (
         |  SELECT ticker, ${Det.sqlAvg("price")} AS lp,
         |    CAST(row_number() OVER (ORDER BY ticker) AS INT) AS ti
         |  FROM bars GROUP BY ticker)
         |SELECT ticker,
         |  CASE WHEN ti % 2 = 1 AND lp > CAST(100.0 AS DOUBLE) THEN 'ts'
         |       WHEN ti <= 3 THEN 'llm_fallback'
         |       ELSE 'default_hold' END AS served_by,
         |  CASE WHEN ti % 2 = 1 AND lp > CAST(100.0 AS DOUBLE) THEN 'BUY'
         |       ELSE 'HOLD' END AS action,
         |  CASE WHEN ti % 2 = 1 AND lp > CAST(100.0 AS DOUBLE)
         |         THEN lp / (lp + CAST(1.0 AS DOUBLE))
         |       WHEN ti <= 3 THEN CAST(0.25 AS DOUBLE)
         |       ELSE CAST(0.0 AS DOUBLE) END AS confidence,
         |  CAST(CASE WHEN ti % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS att_ts,
         |  CAST(CASE WHEN ti % 2 = 1 AND lp > CAST(100.0 AS DOUBLE)
         |       THEN 0 ELSE 1 END AS BIGINT) AS att_llm,
         |  CAST(CASE WHEN NOT (ti % 2 = 1 AND lp > CAST(100.0 AS DOUBLE))
         |            AND ti > 3 THEN 1 ELSE 0 END AS BIGINT) AS held
         |FROM dim""".stripMargin,

    // scoreByName replay: margin = b + ((w1·x1 + w2·x2) + w3·x3) in the
    // kernel's left-assoc order, then sigmoid(plattA·margin + plattB)
    // clipped to [0,1]; the three disable branches (n<30, feature-name
    // mismatch, missing-feature NaN) surface as NULL — the kernel's
    // None and the SQL NULL both land as NaN in the compare frame
    "q179_directional_score" ->
      s"""${Bars.sql},
         |d1 AS (
         |  SELECT ticker, day, ${Det.sqlAvg("price")} AS dp,
         |         MAX(price) - MIN(price) AS atr
         |  FROM bars GROUP BY ticker, day),
         |dim AS (
         |  SELECT ticker, ${Det.sqlAvg("price")} AS lp,
         |         ${Det.sqlStddev("price")} AS sd
         |  FROM bars GROUP BY ticker),
         |d2 AS (
         |  SELECT d1.ticker, dp, atr, lp, sd,
         |    CAST(row_number() OVER (PARTITION BY d1.ticker ORDER BY day)
         |      AS INT) AS di
         |  FROM d1 JOIN dim ON dim.ticker = d1.ticker),
         |m AS (
         |  SELECT ticker, di,
         |    CAST(1.0 AS DOUBLE) + sd / lp AS pa,
         |    CAST(-0.1 AS DOUBLE) +
         |      (((CAST(2.0 AS DOUBLE) + sd / lp) * (dp / lp - CAST(1.0 AS DOUBLE))
         |        + CAST(-1.5 AS DOUBLE) * (atr / lp))
         |       + CAST(0.5 AS DOUBLE) * (sd / lp)) AS margin
         |  FROM d2)
         |SELECT ticker, di,
         |  CASE WHEN di % 13 = 0 OR di % 11 = 0 OR di % 7 = 0 THEN NULL
         |    ELSE GREATEST(CAST(0.0 AS DOUBLE), LEAST(CAST(1.0 AS DOUBLE),
         |      CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
         |        + EXP(-((pa * margin) + CAST(-0.05 AS DOUBLE))))))
         |  END AS p_up
         |FROM m""".stripMargin
  )
}
