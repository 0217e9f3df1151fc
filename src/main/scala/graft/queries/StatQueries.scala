package graft.queries

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.stats.{PortfolioMath, StatTests}

/** Portfolio-math scalar kernels under the oracle gate.
  *
  * q163: Shapley attribution over a three-model universe (reference
  * models/ensemble attribution; PortfolioMath.shapley) — the coalition
  * value function is a closed-form max-plus-diversity score over
  * per-ticker data aggregates, so every subset value and the factorial
  * weights replay exactly; each model's contribution is a FOUR-term sum
  * mirrored in the Scala subsets() enumeration order (∅, {o1}, {o2},
  * {o1,o2} — size-ascending, insertion order within size).
  *
  * q165/q166: the Markowitz min-variance and risk-parity optimizers
  * (reference etl/portfolio_math.py:312-387, scipy SLSQP stand-ins) run
  * as the REAL PortfolioMath kernels on a three-asset covariance built
  * from distributed floor-quantized moments (the q84 construction); the
  * oracle replays every projected-gradient / proportional-damping
  * iteration in the kernel's exact IEEE op order with a recursive CTE —
  * including the k=3 simplex projection (median-of-three sort, the
  * scanLeft cumulative sums, the ρ scan, θ) per step.
  *
  * q167: NGN effective return + payoff asymmetry
  * (etl/portfolio_math.py:852-1032, :1083-1191) over the first 100
  * returns per ticker — the win/loss tail sums and the cumulative
  * product replay SEQUENTIALLY (double addition is order-dependent, so
  * the oracle walks the same date order the kernel's array fold does).
  *
  * q168: seeded bootstrap CI of the mean (etl/portfolio_math.py:388-431)
  * — the kernel's explicit 31-bit LCG resampling stream is replayed
  * draw-by-draw (3 900 recursion steps per ticker in lockstep), then the
  * sorted-means quantile index arithmetic picks the same two order
  * statistics.
  */
object StatQueries extends QueryModule {

  /** Engine-invariant moment quantization (the q83/q84 fix): floor
    * (x·1e12 + 0.5) is pure IEEE double arithmetic, identical in Spark
    * and DuckDB, and the quanta sum exactly in DECIMAL(38,0). */
  private def q12(e: Column): Column =
    sum(floor(e * lit(1e12) + lit(0.5)).cast(DecimalType(38, 0)))
      .cast("double") / lit(1e12)

  private val mvTickers = Seq("click", "purchase", "view")

  /** Three-asset /n covariance entries (c11..c33) as ONE wide row, built
    * exactly like q84's pairwise centered moments — all distributed,
    * no driver collect; the optimizer kernel runs inside the final
    * single-row typed map. */
  private def covRow(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    val daily = Bars.of(s, dir).where($"ticker".isin(mvTickers: _*))
      .groupBy($"ticker", $"day").agg(Det.davg($"price").as("p"))
    val wd = Window.partitionBy($"ticker").orderBy($"day")
    val rets = daily
      .select($"ticker", $"day", ($"p" / lag($"p", 1).over(wd) - 1).as("r"))
      .where($"r".isNotNull)
    val full = rets.groupBy($"day").agg(count(lit(1)).as("c"))
      .where($"c" === mvTickers.size).select($"day")
    val al = rets.join(broadcast(full), Seq("day"))
    val means = al.groupBy($"ticker").agg((q12($"r") / count($"r")).as("m"))
    val cent = al.join(broadcast(means), Seq("ticker"))
      .select($"ticker", $"day", ($"r" - $"m").as("c"))
    val a = cent.select($"ticker".as("ta"), $"day", $"c".as("ca"))
    val b = cent.select($"ticker".as("tb"), $"day", $"c".as("cb"))
    val pairs = a.join(b, Seq("day")).where($"ta" <= $"tb")
      .groupBy($"ta", $"tb")
      .agg((q12($"ca" * $"cb") / count(lit(1))).as("s"))
    def ce(i: String, j: String) =
      max(when($"ta" === i && $"tb" === j, $"s"))
    pairs.agg(
      ce("click", "click").as("c11"), ce("click", "purchase").as("c12"),
      ce("click", "view").as("c13"), ce("purchase", "purchase").as("c22"),
      ce("purchase", "view").as("c23"), ce("view", "view").as("c33"))
      .as[(Double, Double, Double, Double, Double, Double)]
  }

  /** Shared oracle CTE chain mirroring [[covRow]] (the q84 fragments)
    * ending in a one-row `cm(c11..c33)`. */
  private val covSql: String = {
    def q12s(x: String) =
      s"(CAST(SUM(CAST(floor(($x)*1e12 + CAST(0.5 AS DOUBLE)) AS DECIMAL(38,0))) AS DOUBLE) / 1e12)"
    s"""daily AS (
       |  SELECT ticker, day, ${Det.sqlAvg("price")} AS p
       |  FROM bars WHERE ticker IN ('click', 'purchase', 'view')
       |  GROUP BY ticker, day),
       |rets AS MATERIALIZED (
       |  SELECT ticker, day,
       |    p / lag(p, 1) OVER (PARTITION BY ticker ORDER BY day) - 1 AS r
       |  FROM daily
       |  QUALIFY r IS NOT NULL),
       |fulld AS (
       |  SELECT day FROM rets GROUP BY day HAVING COUNT(*) = 3),
       |al AS MATERIALIZED (SELECT rets.* FROM rets JOIN fulld USING (day)),
       |means AS (
       |  SELECT ticker, ${q12s("r")} / COUNT(r) AS m FROM al GROUP BY ticker),
       |cent AS MATERIALIZED (
       |  SELECT al.ticker, al.day, al.r - means.m AS c
       |  FROM al JOIN means USING (ticker)),
       |pairs AS (
       |  SELECT a.ticker AS ta, b.ticker AS tb,
       |    ${q12s("a.c * b.c")} / COUNT(*) AS s
       |  FROM cent a JOIN cent b USING (day)
       |  WHERE a.ticker <= b.ticker
       |  GROUP BY 1, 2),
       |cm AS MATERIALIZED (
       |  SELECT
       |    MAX(CASE WHEN ta='click' AND tb='click' THEN s END) AS c11,
       |    MAX(CASE WHEN ta='click' AND tb='purchase' THEN s END) AS c12,
       |    MAX(CASE WHEN ta='click' AND tb='view' THEN s END) AS c13,
       |    MAX(CASE WHEN ta='purchase' AND tb='purchase' THEN s END) AS c22,
       |    MAX(CASE WHEN ta='purchase' AND tb='view' THEN s END) AS c23,
       |    MAX(CASE WHEN ta='view' AND tb='view' THEN s END) AS c33
       |  FROM pairs)""".stripMargin
  }

  /** SQL for one projected-gradient/damping step's shared dot products:
    * dot_i = ((c_i1·w1) + c_i2·w2) + c_i3·w3 — the kernel's ascending-j
    * accumulation (0.0 + x = x exactly for the nonzero diagonals). */
  private def dotSql(i: Int): String = i match {
    case 1 => "((c11*w1) + c12*w2) + c13*w3"
    case 2 => "((c12*w1) + c22*w2) + c23*w3"
    case _ => "((c13*w1) + c23*w2) + c33*w3"
  }

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
    }),

    "q165_min_variance" -> ((s, dir) => {
      import s.implicits._
      covRow(s, dir).flatMap { case (c11, c12, c13, c22, c23, c33) =>
        val cov = DenseMatrix(
          (c11, c12, c13), (c12, c22, c23), (c13, c23, c33))
        // lr scaled to the tiny return-covariance gradient (Σ ~ 1e-4)
        // so 600 steps actually travel; stable: lr << 1/(2·λmax)
        val w = PortfolioMath.minVarianceWeights(cov, iters = 600, lr = 25.0)
        mvTickers.zip(w)
      }.toDF("asset", "weight")
    }),

    "q166_risk_parity" -> ((s, dir) => {
      import s.implicits._
      covRow(s, dir).flatMap { case (c11, c12, c13, c22, c23, c33) =>
        val cov = DenseMatrix(
          (c11, c12, c13), (c12, c22, c23), (c13, c23, c33))
        val w = PortfolioMath.riskParityWeights(cov, iters = 200)
        mvTickers.zip(w)
      }.toDF("asset", "weight")
    }),

    "q167_ngn_payoff" -> ((s, dir) => {
      import s.implicits._
      Bars.firstN(s, dir, 101)
        .as[(String, java.sql.Timestamp, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (ticker, rows) =>
          val px = rows.toArray.sortBy(r => (r._2.getTime, r._3))
            .map(_._4).take(101)
          if (px.length < 3) Iterator.empty
          else {
            val rets = px.sliding(2).collect {
              case Array(a, b) => b / a - 1
            }.toArray
            val cum = rets.foldLeft(1.0)((c, r) => c * (1 + r))
            val ngn = PortfolioMath.ngnEffectiveReturn(cum - 1,
              fxDriftAnnual = 0.15, p2pFrictionBps = 150,
              holdingDays = rets.length)
            Iterator.single(
              (ticker, PortfolioMath.payoffAsymmetry(rets), ngn))
          }
        }
        .toDF("ticker", "payoff_asym", "ngn_eff")
    }),

    "q171_platt_calibration" -> ((s, dir) => {
      import s.implicits._
      Bars.firstN(s, dir, 21)
        .as[(String, java.sql.Timestamp, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (ticker, rows) =>
          val px = rows.toArray.sortBy(r => (r._2.getTime, r._3))
            .map(_._4).take(21)
          if (px.length < 21) Iterator.empty
          else {
            val rets = px.sliding(2).collect {
              case Array(a, b) => b / a - 1
            }.toArray
            val scores = Array.tabulate(19)(j => rets(j) * 100)
            val labels = Array.tabulate(19)(j => if (rets(j + 1) > 0) 1 else 0)
            val (a, b) = PortfolioMath.plattFit(scores, labels, iters = 30)
            Iterator.single(
              (ticker, a, b, PortfolioMath.plattApply(a, b)(scores(0))))
          }
        }
        .toDF("ticker", "platt_a", "platt_b", "p_first")
    }),

    "q168_bootstrap_ci" -> ((s, dir) => {
      import s.implicits._
      Bars.firstN(s, dir, 40)
        .as[(String, java.sql.Timestamp, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (ticker, rows) =>
          val px = rows.toArray.sortBy(r => (r._2.getTime, r._3))
            .map(_._4).take(40)
          if (px.length < 40) Iterator.empty
          else {
            val rets = px.sliding(2).collect {
              case Array(a, b) => b / a - 1
            }.toArray
            val (lo, hi) = StatTests.bootstrapCI(rets, nBoot = 100,
              alpha = 0.05, seed = 42L)
            Iterator.single((ticker, lo, hi))
          }
        }
        .toDF("ticker", "ci_lo", "ci_hi")
    }),

    // Barbell feasible-region projection (risk/barbell_policy.py:96-189
    // bucket_weights + project_to_feasible): per-cohort portfolio
    // weight vectors — event-count shares over the five event types,
    // exact BIGINT counts divided in double — through the REAL
    // PortfolioMath.barbellProject, with per-cohort caps chosen so
    // every branch of the decision tree fires somewhere (risk cap on/
    // off, the coreMax>0 guard, spec cap, safe floor + donor scaling,
    // final renormalization). Scale: one count aggregation is the only
    // shuffle; the kernel is a per-group O(assets) pass — portfolios
    // are the parallel unit, same as q165/q166.
    "q212_barbell_project" -> ((s, dir) => {
      import s.implicits._
      val assets = Array("click", "error", "purchase", "signup", "view")
      val bArr = Array("safe", "spec", "core", "other", "core")
      graft.Tables.load(s, dir, "events")
        .groupBy(($"user_id" % 7).as("pf"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .as[(Long, String, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (pf, rows) =>
          val n = rows.map(r => r._2 -> r._3).toMap
          val counts = assets.map(a => n.getOrElse(a, 0L))
          var nTot = 0L
          counts.foreach(nTot += _)
          val w0 = counts.map(c => c.toDouble / nTot.toDouble)
          val riskMax = 0.45 + 0.05 * (pf % 4).toDouble
          val coreMax = if (pf % 3 == 0) 0.0 else 0.28
          val specMax = 0.10
          val safeMin = 0.25 + 0.10 * (pf % 2).toDouble
          val w = PortfolioMath.barbellProject(
            w0, bArr, riskMax, coreMax, specMax, safeMin)
          assets.indices.map(i => (pf, assets(i), bArr(i), w0(i), w(i)))
        }
        .toDF("pf", "asset", "bucket", "weight_raw", "weight")
    }),

    // Barbell confidence-sizing overlay (risk/barbell_sizing.py:129-356
    // apply_barbell_confidence + evaluate_barbell_path_risk): per-event
    // market contexts with every None pattern exercised (null edge /
    // cost / gap / funding / depth / order / leverage / horizon on
    // coprime modulo cycles, plus blank and unmapped regimes), through
    // the REAL BarbellSizing columns — bucket + regime + min-of-leg
    // market multipliers and the binary path-risk audit. Pure per-row
    // Column arithmetic: zero shuffles, whole-stage codegen end to end.
    "q213_barbell_confidence" -> ((s, dir) => {
      import s.implicits._
      import graft.stats.BarbellSizing
      val o = BarbellSizing.Overlay(
        bucketMult = Map("safe" -> 1.0, "core" -> 0.9, "spec" -> 0.7),
        regimeMult = Map(
          "BULL" -> Map("core" -> 1.1, "spec" -> 1.2),
          "BEAR" -> Map("spec" -> 0.5, "other" -> 0.9)))
      val id = $"event_id"
      val v = $"value"
      val ctx = graft.Tables.load(s, dir, "events").select(
        id, $"event_type".as("ticker"),
        ((id % 130).cast("double") / lit(100.0)).as("base_conf"),
        when(id % 7 === 0, lit(null).cast("double"))
          .when(v === 250.0, lit(0.0))
          .otherwise((v - lit(250.0)) / lit(10000.0)).as("ret_net"),
        when(id % 5 === 0, lit(null).cast("int"))
          .otherwise((id % 9 - 2).cast("int")).as("horizon"),
        when(id % 3 === 0, lit(null).cast("double"))
          .otherwise(v % 20.0).as("cost_bps"),
        when(id % 4 === 0, lit(null).cast("double"))
          .otherwise((v % 7.0) / lit(100.0)).as("gap_pct"),
        when(id % 6 === 0, lit(null).cast("double"))
          .otherwise(lit(1.0) + v % 3.0).as("lev"),
        when(id % 8 === 0, lit(null).cast("double"))
          .otherwise((v % 5.0) / lit(2.0)).as("funding"),
        when(id % 9 === 0, lit(null).cast("double"))
          .otherwise(v * 10.0 + 1.0).as("depth"),
        when(id % 10 === 0, lit(null).cast("double"))
          .otherwise(v % 400.0).as("order_notional"),
        element_at(typedLit(Seq("BULL", "BEAR", "", "flat")),
          (pmod(id, lit(4)) + 1).cast("int")).as("regime"))
      val r = BarbellSizing.ratios($"ret_net", $"horizon", $"cost_bps",
        $"gap_pct", $"lev", $"funding", $"depth", $"order_notional")
      val c = BarbellSizing.applyConfidence($"ticker", $"base_conf",
        $"regime", r, o, safe = Seq("click"),
        core = Seq("purchase", "view"), spec = Seq("error"))
      ctx.select($"event_id", $"ticker",
        c("bucket").as("bucket"),
        c("bucket_mult").as("bucket_mult"),
        c("regime_mult").as("regime_mult"),
        c("market_mult").as("market_mult"),
        c("multiplier").as("multiplier"),
        c("effective_confidence").as("effective_confidence"),
        c("path_risk_ok").as("path_risk_ok"))
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
         |FROM v CROSS JOIN (VALUES ('a'), ('b'), ('c')) m(model)""".stripMargin,

    // Replays PortfolioMath.minVarianceWeights iteration-for-iteration:
    // v_i = w_i − (dot_i·2)·lr with ascending-j dots, then the simplex
    // projection — u = sort-desc via greatest/median-of-3/least, css =
    // scanLeft partial sums (0.0+u1 = u1), ρ scanned from i=2 down, θ,
    // w′_i = max(0, v_i+θ) (+0.0 normalizes DuckDB's possible −0.0 from
    // GREATEST — the kernel's Math.max(0.0, x) never returns −0.0).
    "q165_min_variance" -> {
      val D = "CAST(1.0 AS DOUBLE)"
      def vExpr(i: Int) =
        s"it.w$i - (((${dotSql(i)}) * CAST(2.0 AS DOUBLE)) * CAST(25.0 AS DOUBLE)) AS v$i"
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |$covSql,
         |it AS (
         |  SELECT 0 AS i, $D / CAST(3.0 AS DOUBLE) AS w1,
         |         $D / CAST(3.0 AS DOUBLE) AS w2,
         |         $D / CAST(3.0 AS DOUBLE) AS w3
         |  UNION ALL
         |  SELECT i,
         |    GREATEST(CAST(0.0 AS DOUBLE), v1 + theta) + CAST(0.0 AS DOUBLE) AS w1,
         |    GREATEST(CAST(0.0 AS DOUBLE), v2 + theta) + CAST(0.0 AS DOUBLE) AS w2,
         |    GREATEST(CAST(0.0 AS DOUBLE), v3 + theta) + CAST(0.0 AS DOUBLE) AS w3
         |  FROM (
         |    SELECT i, v1, v2, v3,
         |      CASE WHEN u3 + ($D - css3) / CAST(3.0 AS DOUBLE) > CAST(0.0 AS DOUBLE)
         |             THEN ($D - css3) / CAST(3.0 AS DOUBLE)
         |           WHEN u2 + ($D - css2) / CAST(2.0 AS DOUBLE) > CAST(0.0 AS DOUBLE)
         |             THEN ($D - css2) / CAST(2.0 AS DOUBLE)
         |           ELSE ($D - css1) / $D END AS theta
         |    FROM (
         |      SELECT i, v1, v2, v3, u2, u3,
         |        u1 AS css1, u1 + u2 AS css2, (u1 + u2) + u3 AS css3
         |      FROM (
         |        SELECT i, v1, v2, v3,
         |          GREATEST(v1, v2, v3) AS u1,
         |          GREATEST(LEAST(v1, v2), LEAST(GREATEST(v1, v2), v3)) AS u2,
         |          LEAST(v1, v2, v3) AS u3
         |        FROM (
         |          SELECT it.i + 1 AS i,
         |            ${vExpr(1)},
         |            ${vExpr(2)},
         |            ${vExpr(3)}
         |          FROM it, cm WHERE it.i < 600
         |        ) s0
         |      ) s1
         |    ) s2
         |  ) s3
         |)
         |SELECT a.asset,
         |  CASE a.asset WHEN 'click' THEN w1 WHEN 'purchase' THEN w2
         |    ELSE w3 END AS weight
         |FROM it, (VALUES ('click'), ('purchase'), ('view')) a(asset)
         |WHERE i = 600""".stripMargin
    },

    // Replays PortfolioMath.riskParityWeights: rc_i = w_i·dot_i with
    // ascending-j dots, sumRc/target accumulated left-to-right, damped
    // update w_i·sqrt(sqrt(target/max(rc_i,1e-12))) (sqrt∘sqrt IS the
    // kernel's engine-invariant quarter-power), then the left-to-right
    // sum normalization.
    "q166_risk_parity" -> {
      def damp(i: Int) =
        s"""s0.w$i * SQRT(SQRT(target / GREATEST(rc$i, CAST(1e-12 AS DOUBLE)))) AS wt$i"""
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |$covSql,
         |it AS (
         |  SELECT 0 AS i, CAST(1.0 AS DOUBLE) / CAST(3.0 AS DOUBLE) AS w1,
         |         CAST(1.0 AS DOUBLE) / CAST(3.0 AS DOUBLE) AS w2,
         |         CAST(1.0 AS DOUBLE) / CAST(3.0 AS DOUBLE) AS w3
         |  UNION ALL
         |  SELECT i, wt1 / sumw AS w1, wt2 / sumw AS w2, wt3 / sumw AS w3
         |  FROM (
         |    SELECT i, wt1, wt2, wt3, (wt1 + wt2) + wt3 AS sumw
         |    FROM (
         |      SELECT i, ${damp(1)}, ${damp(2)}, ${damp(3)}
         |      FROM (
         |        SELECT it.i + 1 AS i, it.w1, it.w2, it.w3,
         |          it.w1 * (${dotSql(1)}) AS rc1,
         |          it.w2 * (${dotSql(2)}) AS rc2,
         |          it.w3 * (${dotSql(3)}) AS rc3,
         |          ((it.w1 * (${dotSql(1)}) + it.w2 * (${dotSql(2)}))
         |            + it.w3 * (${dotSql(3)})) / CAST(3.0 AS DOUBLE) AS target
         |        FROM it, cm WHERE it.i < 200
         |      ) s0
         |    ) s1
         |  ) s2
         |)
         |SELECT a.asset,
         |  CASE a.asset WHEN 'click' THEN w1 WHEN 'purchase' THEN w2
         |    ELSE w3 END AS weight
         |FROM it, (VALUES ('click'), ('purchase'), ('view')) a(asset)
         |WHERE i = 200""".stripMargin
    },

    // Sequential replay of the q167 kernels over the first ≤100 returns
    // per ticker in (ts, seq) order: the win/loss tail sums accumulate in
    // the SAME order the Scala array fold does, the cumulative product
    // walks 1·(1+r₁)·(1+r₂)…, and the NGN formula replays
    // ngnEffectiveReturn's exact op sequence (1+(cum−1), the pow fx
    // drift, the bps friction, left-assoc products).
    //
    // KNOWN ULP DEPENDENCY (unique among this round's gates): the fx
    // drift term POWER(1.15, n/365) relies on DuckDB's libm pow agreeing
    // with Java Math.pow — a fractional-exponent pow has NO replayable
    // IEEE op sequence (exp/ln are no better), unlike the sqrt∘sqrt /
    // explicit-product constructions used everywhere else. Both libms
    // target correctly-rounded pow for these magnitudes and the gate has
    // held at every SF tested; if a last-ulp tie ever surfaces here, the
    // remedy is to emit the drift factor as its own column and gate the
    // remaining (fully replayable) products exactly.
    "q167_ngn_payoff" -> {
      val D = "CAST(1.0 AS DOUBLE)"
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |sel AS (
         |  SELECT ticker, price,
         |    row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS rn
         |  FROM bars QUALIFY rn <= 101),
         |rr AS MATERIALIZED (
         |  SELECT ticker,
         |    price / lag(price, 1) OVER (PARTITION BY ticker ORDER BY rn) - 1 AS r,
         |    rn - 1 AS i
         |  FROM sel QUALIFY r IS NOT NULL),
         |cnt AS (SELECT ticker, COUNT(*) AS n FROM rr GROUP BY ticker),
         |walk AS (
         |  SELECT ticker, 0 AS i, CAST(0.0 AS DOUBLE) AS sw,
         |    CAST(0 AS BIGINT) AS nw, CAST(0.0 AS DOUBLE) AS sl,
         |    CAST(0 AS BIGINT) AS nl, $D AS cum
         |  FROM cnt WHERE n >= 2
         |  UNION ALL
         |  SELECT w.ticker, w.i + 1,
         |    CASE WHEN r.r > 0 THEN w.sw + r.r ELSE w.sw END,
         |    CASE WHEN r.r > 0 THEN w.nw + 1 ELSE w.nw END,
         |    CASE WHEN r.r < 0 THEN w.sl + r.r ELSE w.sl END,
         |    CASE WHEN r.r < 0 THEN w.nl + 1 ELSE w.nl END,
         |    w.cum * ($D + r.r)
         |  FROM walk w JOIN rr r ON r.ticker = w.ticker AND r.i = w.i + 1),
         |fin AS (
         |  SELECT walk.*, cnt.n FROM walk JOIN cnt USING (ticker)
         |  WHERE walk.i = cnt.n)
         |SELECT ticker,
         |  CASE WHEN nw = 0 THEN CAST(0.0 AS DOUBLE)
         |       WHEN nl = 0 THEN CAST('infinity' AS DOUBLE)
         |       ELSE (sw / nw) / ABS(sl / nl) END AS payoff_asym,
         |  (($D + (cum - $D))
         |    * ($D + (POWER($D + CAST(0.15 AS DOUBLE),
         |        CAST(n AS DOUBLE) / CAST(365.0 AS DOUBLE)) - $D)))
         |    * ($D - CAST(150.0 AS DOUBLE) / CAST(1e4 AS DOUBLE)) - $D AS ngn_eff
         |FROM fin""".stripMargin
    },

    // Replays PortfolioMath.plattFit pair-for-pair: the Newton state
    // (a, b) plus the five gradient/Hessian accumulators walk one
    // recursion step per (iteration, pair) — 30×19 = 570 lockstep steps
    // per ticker. Accumulators reset at each pass start (t%19 = 0 on the
    // source row), the Newton update lands on the step that consumes the
    // pass's last pair, and the |det| ≤ 1e-12 degenerate guard replays
    // as the same CASE. σ(a·x+b) saturating to exp-overflow is benign:
    // both engines return ±inf → p ∈ {0,1} exactly.
    "q171_platt_calibration" -> {
      val D1 = "CAST(1.0 AS DOUBLE)"
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |sel AS (
         |  SELECT ticker, price,
         |    row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS rn
         |  FROM bars QUALIFY rn <= 21),
         |rr AS MATERIALIZED (
         |  SELECT ticker,
         |    price / lag(price, 1) OVER (PARTITION BY ticker ORDER BY rn) - 1 AS r,
         |    rn - 1 AS i
         |  FROM sel QUALIFY r IS NOT NULL),
         |pl AS MATERIALIZED (
         |  SELECT a.ticker, a.i AS j, a.r * CAST(100.0 AS DOUBLE) AS x,
         |    CASE WHEN b.r > 0 THEN 1 ELSE 0 END AS y
         |  FROM rr a JOIN rr b ON b.ticker = a.ticker AND b.i = a.i + 1
         |  WHERE a.i <= 19),
         |full20 AS (
         |  SELECT ticker FROM rr GROUP BY ticker HAVING COUNT(*) = 20),
         |it AS (
         |  SELECT ticker, 0 AS t, $D1 AS a, CAST(0.0 AS DOUBLE) AS b,
         |    CAST(0.0 AS DOUBLE) AS ga, CAST(0.0 AS DOUBLE) AS gb,
         |    CAST(0.0 AS DOUBLE) AS haa, CAST(0.0 AS DOUBLE) AS hab,
         |    CAST(0.0 AS DOUBLE) AS hbb
         |  FROM full20
         |  UNION ALL
         |  SELECT ticker, t,
         |    CASE WHEN t % 19 = 0 AND ABS(det) > CAST(1e-12 AS DOUBLE)
         |         THEN a - (hbb1 * ga1 - hab1 * gb1) / det ELSE a END,
         |    CASE WHEN t % 19 = 0 AND ABS(det) > CAST(1e-12 AS DOUBLE)
         |         THEN b - (haa1 * gb1 - hab1 * ga1) / det ELSE b END,
         |    ga1, gb1, haa1, hab1, hbb1
         |  FROM (
         |    SELECT *, haa1 * hbb1 - hab1 * hab1 AS det
         |    FROM (
         |      SELECT ticker, t0 + 1 AS t, a, b,
         |        (CASE WHEN t0 % 19 = 0 THEN CAST(0.0 AS DOUBLE) ELSE ga END)
         |          + (p - y) * x AS ga1,
         |        (CASE WHEN t0 % 19 = 0 THEN CAST(0.0 AS DOUBLE) ELSE gb END)
         |          + (p - y) AS gb1,
         |        (CASE WHEN t0 % 19 = 0 THEN CAST(0.0 AS DOUBLE) ELSE haa END)
         |          + (p * (1 - p)) * x * x AS haa1,
         |        (CASE WHEN t0 % 19 = 0 THEN CAST(0.0 AS DOUBLE) ELSE hab END)
         |          + (p * (1 - p)) * x AS hab1,
         |        (CASE WHEN t0 % 19 = 0 THEN CAST(0.0 AS DOUBLE) ELSE hbb END)
         |          + (p * (1 - p)) AS hbb1
         |      FROM (
         |        SELECT it.ticker, it.t AS t0, it.a, it.b, it.ga, it.gb,
         |          it.haa, it.hab, it.hbb, pl.x, pl.y,
         |          $D1 / ($D1 + EXP(-(it.a * pl.x + it.b))) AS p
         |        FROM it JOIN pl ON pl.ticker = it.ticker
         |          AND pl.j = (it.t % 19) + 1
         |        WHERE it.t < 570
         |      ) s0
         |    ) s1
         |  ) s2),
         |fin AS (SELECT ticker, a, b FROM it WHERE t = 570),
         |x1 AS (SELECT ticker, x FROM pl WHERE j = 1)
         |SELECT f.ticker, f.a AS platt_a, f.b AS platt_b,
         |  $D1 / ($D1 + EXP(-(f.a * x1.x + f.b))) AS p_first
         |FROM fin f JOIN x1 ON x1.ticker = f.ticker""".stripMargin
    },

    // Replays StatTests.bootstrapCI draw-for-draw: the 31-bit LCG stream
    // s ← (1103515245·s + 12345) mod 2³¹ starting at seed 42 advances
    // 100×39 steps per ticker (boot accumulator resets every 39 draws),
    // each draw indexing the date-ordered return array by s mod 39; the
    // CI bounds are the 3rd and 98th ascending order statistics of the
    // 100 bootstrap means ((α/2·nBoot).toInt = 2, ((1−α/2)·nBoot).toInt
    // = 97, 0-indexed).
    "q168_bootstrap_ci" ->
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |sel AS (
         |  SELECT ticker, price,
         |    row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS rn
         |  FROM bars QUALIFY rn <= 40),
         |rr AS MATERIALIZED (
         |  SELECT ticker,
         |    price / lag(price, 1) OVER (PARTITION BY ticker ORDER BY rn) - 1 AS r,
         |    rn - 1 AS i
         |  FROM sel QUALIFY r IS NOT NULL),
         |cnt AS (SELECT ticker, COUNT(*) AS n FROM rr GROUP BY ticker),
         |walk AS (
         |  SELECT ticker, 0 AS t, CAST(42 AS BIGINT) AS s,
         |    CAST(0.0 AS DOUBLE) AS acc
         |  FROM cnt WHERE n = 39
         |  UNION ALL
         |  SELECT w.ticker, w.t + 1, w.s2,
         |    (CASE WHEN (w.t % 39) = 0 THEN CAST(0.0 AS DOUBLE)
         |          ELSE w.acc END) + r.r
         |  FROM (
         |    SELECT ticker, t, acc,
         |      (1103515245 * s + 12345) % 2147483648 AS s2
         |    FROM walk WHERE t < 3900
         |  ) w JOIN rr r ON r.ticker = w.ticker AND r.i = (w.s2 % 39) + 1),
         |means AS (
         |  SELECT ticker, acc / 39 AS mean FROM walk
         |  WHERE t > 0 AND (t % 39) = 0),
         |ranked AS (
         |  SELECT ticker, mean,
         |    row_number() OVER (PARTITION BY ticker ORDER BY mean) AS rk
         |  FROM means)
         |SELECT ticker,
         |  MAX(CASE WHEN rk = 3 THEN mean END) AS ci_lo,
         |  MAX(CASE WHEN rk = 98 THEN mean END) AS ci_hi
         |FROM ranked GROUP BY ticker""".stripMargin,

    // Replays barbellProject stage by stage in the kernel's exact IEEE
    // op order: fixed asset order click/error/purchase/signup/view
    // (w1..w5), left-assoc sums, every conditional scale mirrored as
    // ×1.0 when its branch does not fire (exact identity), the safe
    // floor's donor factor max(0, 1−deficit/(total−safe)) and boost
    // 1+deficit/safe_current, then the ≠-guarded renormalization to
    // the ORIGINAL left-assoc total.
    "q212_barbell_project" -> {
      val D1 = "CAST(1.0 AS DOUBLE)"
      val D0 = "CAST(0.0 AS DOUBLE)"
      s"""WITH cnt AS (
         |  SELECT user_id % 7 AS pf,
         |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
         |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n2,
         |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n3,
         |    SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n4,
         |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n5
         |  FROM events GROUP BY 1),
         |w0 AS (
         |  SELECT pf,
         |    CAST(n1 AS DOUBLE) / nt AS w1, CAST(n2 AS DOUBLE) / nt AS w2,
         |    CAST(n3 AS DOUBLE) / nt AS w3, CAST(n4 AS DOUBLE) / nt AS w4,
         |    CAST(n5 AS DOUBLE) / nt AS w5,
         |    CAST(0.45 AS DOUBLE)
         |      + CAST(0.05 AS DOUBLE) * CAST(pf % 4 AS DOUBLE) AS risk_max,
         |    CASE WHEN pf % 3 = 0 THEN $D0
         |         ELSE CAST(0.28 AS DOUBLE) END AS core_max,
         |    CAST(0.10 AS DOUBLE) AS spec_max,
         |    CAST(0.25 AS DOUBLE)
         |      + CAST(0.10 AS DOUBLE) * CAST(pf % 2 AS DOUBLE) AS safe_min
         |  FROM (SELECT *,
         |      CAST((((n1 + n2) + n3) + n4) + n5 AS DOUBLE) AS nt
         |    FROM cnt) c),
         |s1 AS (
         |  SELECT *,
         |    CASE WHEN traw = $D0 THEN $D1 ELSE traw END AS total,
         |    (w3 + w5) + w2 AS risk0
         |  FROM (SELECT *, (((w1 + w2) + w3) + w4) + w5 AS traw FROM w0) t),
         |s2 AS (
         |  SELECT *, w1 AS a1, w4 AS a4,
         |    w2 * rs AS a2, w3 * rs AS a3, w5 * rs AS a5
         |  FROM (SELECT *,
         |      CASE WHEN risk0 > risk_max
         |        THEN risk_max / GREATEST(risk0, CAST(1e-12 AS DOUBLE))
         |        ELSE $D1 END AS rs
         |    FROM s1) t),
         |s3 AS (
         |  SELECT *, a3 * cs AS b3, a5 * cs AS b5, a2 * ss AS b2
         |  FROM (SELECT *,
         |      CASE WHEN (a3 + a5) > core_max AND core_max > $D0
         |        THEN core_max / GREATEST(a3 + a5, CAST(1e-12 AS DOUBLE))
         |        ELSE $D1 END AS cs,
         |      CASE WHEN a2 > spec_max AND spec_max > $D0
         |        THEN spec_max / GREATEST(a2, CAST(1e-12 AS DOUBLE))
         |        ELSE $D1 END AS ss
         |    FROM s2) t),
         |s4 AS (
         |  SELECT *, a1 * bf AS d1, b2 * nf AS d2, b3 * nf AS d3,
         |    a4 * nf AS d4, b5 * nf AS d5
         |  FROM (SELECT *,
         |      CASE WHEN a1 < safe_min AND (total - a1) > $D0
         |        THEN GREATEST($D0,
         |          $D1 - (safe_min - a1) / (total - a1))
         |        ELSE $D1 END AS nf,
         |      CASE WHEN a1 < safe_min AND (total - a1) > $D0
         |          AND a1 > $D0
         |        THEN $D1 + (safe_min - a1) / a1
         |        ELSE $D1 END AS bf
         |    FROM s3) t),
         |s5 AS (
         |  SELECT pf, w1, w2, w3, w4, w5,
         |    d1 * fs AS f1, d2 * fs AS f2, d3 * fs AS f3,
         |    d4 * fs AS f4, d5 * fs AS f5
         |  FROM (SELECT *,
         |      CASE WHEN ntc <> total THEN total / ntc ELSE $D1 END AS fs
         |    FROM (SELECT *,
         |        CASE WHEN ntraw = $D0 THEN $D1 ELSE ntraw END AS ntc
         |      FROM (SELECT *,
         |          (((d1 + d2) + d3) + d4) + d5 AS ntraw
         |        FROM s4) t0) t1) t2)
         |SELECT pf, a.asset, a.bucket,
         |  CASE a.asset WHEN 'click' THEN w1 WHEN 'error' THEN w2
         |    WHEN 'purchase' THEN w3 WHEN 'signup' THEN w4
         |    ELSE w5 END AS weight_raw,
         |  CASE a.asset WHEN 'click' THEN f1 WHEN 'error' THEN f2
         |    WHEN 'purchase' THEN f3 WHEN 'signup' THEN f4
         |    ELSE f5 END AS weight
         |FROM s5, (VALUES ('click', 'safe'), ('error', 'spec'),
         |  ('purchase', 'core'), ('signup', 'other'),
         |  ('view', 'core')) a(asset, bucket)""".stripMargin
    },

    // Replays BarbellSizing expression-for-expression: the None-pattern
    // context build, edge/edge_bps, the leg ratios with their presence
    // conditions, the ratio penalty 1/(1+excess) clamped [floor, 1],
    // min-of-present-legs (LEAST skips NULLs in both engines) clamped
    // [0,1] with empty→1, the regime/bucket multiplier tables, the
    // clamped confidence product, and the all-present-checks path-risk
    // audit with leverage cap 1/max(floor, 1e-6) computed as the same
    // IEEE division.
    "q213_barbell_confidence" -> {
      val D1 = "CAST(1.0 AS DOUBLE)"
      val D0 = "CAST(0.0 AS DOUBLE)"
      def pen(ratio: String, cap: Double, floor: Double) =
        s"""CASE WHEN $ratio IS NULL OR $ratio <= CAST($cap AS DOUBLE)
           |  THEN $D1
           |  ELSE GREATEST(CAST($floor AS DOUBLE), LEAST($D1,
           |    $D1 / ($D1 + GREATEST($D0,
           |      ($ratio - CAST($cap AS DOUBLE)) / CAST($cap AS DOUBLE)))))
           |  END""".stripMargin
      s"""WITH ctx AS (
         |  SELECT event_id, event_type AS ticker,
         |    CAST(event_id % 130 AS DOUBLE) / CAST(100.0 AS DOUBLE)
         |      AS base_conf,
         |    CASE WHEN event_id % 7 = 0 THEN NULL
         |         WHEN value = 250.0 THEN $D0
         |         ELSE (value - CAST(250.0 AS DOUBLE))
         |           / CAST(10000.0 AS DOUBLE) END AS ret_net,
         |    CASE WHEN event_id % 5 = 0 THEN NULL
         |         ELSE CAST(event_id % 9 - 2 AS INT) END AS horizon,
         |    CASE WHEN event_id % 3 = 0 THEN NULL
         |         ELSE value % CAST(20.0 AS DOUBLE) END AS cost_bps,
         |    CASE WHEN event_id % 4 = 0 THEN NULL
         |         ELSE (value % CAST(7.0 AS DOUBLE))
         |           / CAST(100.0 AS DOUBLE) END AS gap_pct,
         |    CASE WHEN event_id % 6 = 0 THEN NULL
         |         ELSE $D1 + value % CAST(3.0 AS DOUBLE) END AS lev,
         |    CASE WHEN event_id % 8 = 0 THEN NULL
         |         ELSE (value % CAST(5.0 AS DOUBLE))
         |           / CAST(2.0 AS DOUBLE) END AS funding,
         |    CASE WHEN event_id % 9 = 0 THEN NULL
         |         ELSE value * CAST(10.0 AS DOUBLE) + $D1 END AS depth,
         |    CASE WHEN event_id % 10 = 0 THEN NULL
         |         ELSE value % CAST(400.0 AS DOUBLE) END AS order_notional,
         |    (['BULL', 'BEAR', '', 'flat'])[CAST(event_id % 4 AS INT) + 1]
         |      AS regime
         |  FROM events),
         |b AS (
         |  SELECT *, CASE WHEN upper(ticker) = 'CLICK' THEN 'safe'
         |    WHEN upper(ticker) IN ('PURCHASE', 'VIEW') THEN 'core'
         |    WHEN upper(ticker) = 'ERROR' THEN 'spec'
         |    ELSE 'other' END AS bucket
         |  FROM ctx),
         |e AS (
         |  SELECT *,
         |    abs(COALESCE(ret_net, $D0)) AS edge,
         |    CASE WHEN abs(COALESCE(ret_net, $D0)) > 0
         |      THEN abs(COALESCE(ret_net, $D0)) * CAST(1e4 AS DOUBLE)
         |      END AS edge_bps,
         |    GREATEST(COALESCE(CAST(CASE WHEN horizon = 0 THEN 1
         |      ELSE horizon END AS INT), 1), 1) AS hz,
         |    CASE WHEN lev IS NULL OR lev = $D0 THEN $D1
         |      ELSE lev END AS lev2
         |  FROM b),
         |rr AS (
         |  SELECT *,
         |    CASE WHEN edge_bps IS NOT NULL AND cost_bps IS NOT NULL
         |      THEN cost_bps / edge_bps END AS r_cost,
         |    CASE WHEN edge > 0 AND gap_pct IS NOT NULL
         |      THEN gap_pct / edge END AS r_gap,
         |    CASE WHEN edge_bps IS NOT NULL AND funding IS NOT NULL
         |      THEN (funding * hz) / edge_bps END AS r_fund,
         |    CASE WHEN depth IS NOT NULL AND order_notional IS NOT NULL
         |      AND depth > 0 THEN order_notional / depth END AS r_liq
         |  FROM e),
         |m AS (
         |  SELECT *,
         |    CASE WHEN r_cost IS NOT NULL
         |      THEN ${pen("r_cost", 0.35, 0.55)} END AS m_cost,
         |    CASE WHEN r_gap IS NOT NULL
         |      THEN ${pen("r_gap", 0.75, 0.50)} END AS m_gap,
         |    CASE WHEN r_fund IS NOT NULL
         |      THEN ${pen("r_fund", 0.25, 0.70)} END AS m_fund,
         |    CASE WHEN r_liq IS NOT NULL
         |      THEN ${pen("r_liq", 0.10, 0.65)} END AS m_liq,
         |    CASE WHEN lev2 > $D1 THEN GREATEST(CAST(0.60 AS DOUBLE),
         |      LEAST($D1, $D1 / lev2)) END AS m_lev
         |  FROM rr),
         |mm AS (
         |  SELECT *,
         |    CASE bucket WHEN 'safe' THEN $D1
         |      WHEN 'core' THEN CAST(0.9 AS DOUBLE)
         |      WHEN 'spec' THEN CAST(0.7 AS DOUBLE)
         |      ELSE CAST(0.85 AS DOUBLE) END AS bucket_mult,
         |    CASE WHEN upper(COALESCE(regime, '')) = 'BULL'
         |        AND bucket = 'core' THEN CAST(1.1 AS DOUBLE)
         |      WHEN upper(COALESCE(regime, '')) = 'BULL'
         |        AND bucket = 'spec' THEN CAST(1.2 AS DOUBLE)
         |      WHEN upper(COALESCE(regime, '')) = 'BEAR'
         |        AND bucket = 'spec' THEN CAST(0.5 AS DOUBLE)
         |      WHEN upper(COALESCE(regime, '')) = 'BEAR'
         |        AND bucket = 'other' THEN CAST(0.9 AS DOUBLE)
         |      ELSE $D1 END AS regime_mult,
         |    COALESCE(GREATEST($D0, LEAST($D1,
         |      LEAST(m_cost, m_gap, m_fund, m_liq, m_lev))), $D1)
         |      AS market_mult
         |  FROM m)
         |SELECT event_id, ticker, bucket, bucket_mult, regime_mult,
         |  market_mult,
         |  (bucket_mult * regime_mult) * market_mult AS multiplier,
         |  GREATEST($D0, LEAST($D1,
         |    GREATEST($D0, LEAST($D1, base_conf))
         |      * ((bucket_mult * regime_mult) * market_mult)))
         |    AS effective_confidence,
         |  COALESCE(r_cost <= CAST(0.35 AS DOUBLE), TRUE)
         |    AND COALESCE(r_gap <= CAST(0.75 AS DOUBLE), TRUE)
         |    AND COALESCE(r_fund <= CAST(0.25 AS DOUBLE), TRUE)
         |    AND COALESCE(r_liq <= CAST(0.10 AS DOUBLE), TRUE)
         |    AND (lev2 <= $D1 / GREATEST(CAST(0.60 AS DOUBLE),
         |      CAST(1e-6 AS DOUBLE))) AS path_risk_ok
         |FROM mm""".stripMargin
    }
  )
}
