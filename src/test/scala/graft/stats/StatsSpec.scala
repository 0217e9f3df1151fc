package graft.stats

import scala.util.Random

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.forecast.MssaRl
import graft.ml.DirectionalClassifier

class StatsSpec extends AnyFunSuite with TestSpark {

  test("special functions match known values") {
    assert(math.abs(StatTests.tPValue(0.0, 10) - 1.0) < 1e-9)
    assert(math.abs(StatTests.tPValue(1.96, 1e6) - 0.05) < 1e-3)
    assert(math.abs(StatTests.chi2PValue(3.841, 1) - 0.05) < 1e-3)
    assert(math.abs(StatTests.regGammaP(1.0, 1.0) - (1 - math.exp(-1))) < 1e-9)
  }

  test("Diebold-Mariano prefers the genuinely better forecaster") {
    val rng = new Random(4)
    val e2 = Array.fill(300)(rng.nextGaussian())
    val e1 = e2.map(_ * 0.5) // model 1 errors uniformly smaller
    val r = StatTests.dieboldMariano(e1, e2)
    assert(r.statistic < -2.0 && r.pValue < 0.05)
    // equal errors: no significance
    val same = StatTests.dieboldMariano(e2, e2.map(identity))
    assert(math.abs(same.statistic) < 1e-9)
  }

  test("Ljung-Box flags autocorrelated series, passes white noise") {
    val rng = new Random(8)
    val wn = Array.fill(500)(rng.nextGaussian())
    assert(StatTests.ljungBox(wn).pValue > 0.01)
    var prev = 0.0
    val ar = Array.fill(500) { prev = 0.7 * prev + rng.nextGaussian(); prev }
    assert(StatTests.ljungBox(ar).pValue < 1e-6)
  }

  test("ADF-lite separates random walks from stationary series") {
    val rng = new Random(2)
    val rw = Array.iterate(0.0, 800)(p => p + rng.nextGaussian())
    var prev = 0.0
    val ar = Array.fill(800) { prev = 0.5 * prev + rng.nextGaussian(); prev }
    assert(StatTests.adfLite(ar).statistic < -5.0)
    assert(StatTests.adfLite(rw).statistic > -3.0)
  }

  test("bootstrap CI brackets the true mean") {
    val rng = new Random(6)
    val x = Array.fill(400)(1.5 + rng.nextGaussian())
    val (lo, hi) = StatTests.bootstrapCI(x)
    assert(lo < 1.5 && 1.5 < hi && hi - lo < 0.5)
    // deterministic under the same seed
    assert(StatTests.bootstrapCI(x) === ((lo, hi)))
  }

  test("Christoffersen detects clustered violations") {
    val clustered = Array.fill(50)(0) ++ Array.fill(12)(1) ++ Array.fill(50)(0)
    val r = StatTests.christoffersen(clustered)
    assert(r.pValue < 0.01)
    val rng = new Random(11)
    val iid = Array.fill(400)(if (rng.nextDouble() < 0.1) 1 else 0)
    assert(StatTests.christoffersen(iid).pValue > 0.01)
  }

  test("portfolio math: omega/kelly/drawdown/ES behave") {
    val rng = new Random(5)
    val rets = Array.fill(1000)(0.0005 + 0.01 * rng.nextGaussian())
    assert(PortfolioMath.sharpe(rets) > 0)
    assert(PortfolioMath.omega(rets) > 1.0)
    val k = PortfolioMath.kelly(rets)
    assert(k > 0 && k <= 0.20)
    assert(PortfolioMath.maxDrawdown(rets) > 0 && PortfolioMath.maxDrawdown(rets) < 1)
    assert(PortfolioMath.expectedShortfall(rets) > 0)
    // ES-to-edge: positive drift -> finite ratio; no edge -> Infinity
    assert(PortfolioMath.esToEdge(rets) > 0 &&
      !PortfolioMath.esToEdge(rets).isInfinite)
    assert(PortfolioMath.esToEdge(rets.map(_ - 1.0)).isPosInfinity)
    // payoff asymmetry: hand-checked tail-means ratio
    val pa = PortfolioMath.payoffAsymmetry(Array(0.10, 0.08, -0.03, -0.03))
    assert(math.abs(pa - 3.0) < 1e-12)
    assert(PortfolioMath.payoffAsymmetry(Array(0.1, 0.2)).isPosInfinity)
    assert(PortfolioMath.payoffAsymmetry(Array(-0.1)) === 0.0)
  }

  test("min-variance and risk-parity weights on a known covariance") {
    val cov = DenseMatrix((0.04, 0.0, 0.0), (0.0, 0.01, 0.0), (0.0, 0.0, 0.0025))
    val mv = PortfolioMath.minVarianceWeights(cov)
    assert(math.abs(mv.sum - 1.0) < 1e-6 && mv.forall(_ >= -1e-9))
    // min-var loads the lowest-variance asset most
    assert(mv(2) > mv(1) && mv(1) > mv(0))
    val rp = PortfolioMath.riskParityWeights(cov)
    assert(math.abs(rp.sum - 1.0) < 1e-9)
    // risk contributions equalized: w_i^2 var_i equal across assets
    val rc = (0 until 3).map(i => rp(i) * rp(i) * cov(i, i))
    assert(rc.max / rc.min < 1.05, rc.toString)
    // shrinkage pulls off-diagonals toward zero
    val noisy = DenseMatrix((0.04, 0.01, 0.01), (0.01, 0.01, 0.005), (0.01, 0.005, 0.0025))
    val shrunk = PortfolioMath.shrink(noisy, 0.5)
    assert(math.abs(shrunk(0, 1)) < math.abs(noisy(0, 1)))
  }

  test("Ledoit-Wolf optimal delta: heavy shrink on short spherical noise, light on long structured data") {
    val rng = new scala.util.Random(19)
    // n=12 observations of p=8 iid assets: sample cov is mostly noise ->
    // the 2004 estimator should shrink hard toward mu*I
    val short = DenseMatrix.tabulate(12, 8)((_, _) => rng.nextGaussian() * 0.01)
    val dShort = PortfolioMath.ledoitWolfDelta(short)
    assert(dShort > 0.5 && dShort <= 1.0, s"dShort=$dShort")
    // n=4000 observations of 3 strongly-correlated assets: S is reliable
    // -> near-zero shrinkage
    val base = Array.fill(4000)(rng.nextGaussian() * 0.02)
    val long = DenseMatrix.tabulate(4000, 3)((i, j) =>
      base(i) * (1.0 + 0.3 * j) + rng.nextGaussian() * 0.002)
    val dLong = PortfolioMath.ledoitWolfDelta(long)
    assert(dLong >= 0.0 && dLong < 0.05, s"dLong=$dLong")
    // estimator shifts the diagonal toward mu and scales off-diagonals
    val lw = PortfolioMath.ledoitWolf(long)
    val n = long.rows
    val means = Array.tabulate(3)(j => (0 until n).map(long(_, j)).sum / n)
    val s01 = (0 until n).map(i =>
      (long(i, 0) - means(0)) * (long(i, 1) - means(1))).sum / n
    assert(math.abs(lw(0, 1) - (1 - dLong) * s01) < 1e-12)
    assert(math.abs(lw(0, 1) - lw(1, 0)) < 1e-15) // symmetric
  }

  test("Shapley attribution sums to the grand coalition value") {
    val models = Seq("AR", "SSA", "GARCH")
    def value(s: Set[String]): Double =
      s.map { case "AR" => 3.0; case "SSA" => 2.0; case "GARCH" => 1.0 }.sum +
        (if (s.size >= 2) 1.0 else 0.0) // synergy
    val sh = PortfolioMath.shapley(models, value)
    assert(math.abs(sh.values.sum - value(models.toSet)) < 1e-9)
    assert(sh("AR") > sh("SSA") && sh("SSA") > sh("GARCH"))
  }

  test("CUSUM finds a planted mean break and stays quiet without one") {
    val rng = new Random(3)
    val calm = Array.fill(400)(rng.nextGaussian() * 0.1)
    assert(MssaRl.cusum(calm).isEmpty)
    val broken = Array.fill(200)(rng.nextGaussian() * 0.1) ++
      Array.fill(200)(3.0 + rng.nextGaussian() * 0.1)
    val breaks = MssaRl.cusum(broken)
    assert(breaks.nonEmpty && breaks.head >= 195 && breaks.head <= 260)
  }

  test("MSSA-RL policy dispatches: break => naive fallback") {
    val rng = new Random(7)
    val stable = Array.tabulate(150)(i => 100 + 0.1 * i + rng.nextGaussian() * 0.01)
    val (_, actStable) = MssaRl.forecast(stable, 5)
    assert(actStable !== MssaRl.FallbackNaive)
    val crashed = stable.take(140) ++ Array.tabulate(10)(i => 60.0 - i)
    val (fc, act) = MssaRl.forecast(crashed, 5)
    assert(act === MssaRl.FallbackNaive)
    assert(fc.forall(_ == crashed.last))
  }

  test("directional classifier separates a linearly separable problem, calibrated") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new Random(9)
    val rows = (1 to 600).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      val up = if (x1 * 1.5 - x2 + 0.3 * rng.nextGaussian() > 0) 1.0 else 0.0
      (x1, x2, up)
    }
    val df = rows.toDF("f1", "f2", "label")
    val model = DirectionalClassifier.train(df, Seq("f1", "f2"))
    val acc = rows.map { case (x1, x2, y) =>
      val p = DirectionalClassifier.score(model)(Array(x1, x2))
      if ((p > 0.5) == (y == 1.0)) 1 else 0
    }.sum / 600.0
    assert(acc > 0.85, s"accuracy $acc")
    // calibration is monotone in the margin
    val p1 = DirectionalClassifier.score(model)(Array(3.0, -3.0))
    val p2 = DirectionalClassifier.score(model)(Array(-3.0, 3.0))
    assert(p1 > 0.9 && p2 < 0.1)
    intercept[IllegalArgumentException] {
      DirectionalClassifier.score(model)(Array(1.0))
    }
  }

  test("scoreByName: reference disable branches and NaN/missing handling") {
    val m = DirectionalClassifier.Model(Seq("a", "b"), Array(1.0, -1.0),
      intercept = 0.0, plattA = 1.0, plattB = 0.0)
    val full = Map("a" -> 1.0, "b" -> 0.5)
    // healthy path equals score() on the same vector
    val viaName = DirectionalClassifier.scoreByName(m, 200, Seq("a", "b"))(full)
    assert(viaName === Some(DirectionalClassifier.score(m)(Array(1.0, 0.5))))
    // < 30 training examples ⇒ scoring disabled
    assert(DirectionalClassifier.scoreByName(m, 29, Seq("a", "b"))(full).isEmpty)
    // feature-name mismatch ⇒ disabled (wrong-column mapping guard)
    assert(DirectionalClassifier.scoreByName(m, 200, Seq("a", "c"))(full).isEmpty)
    // missing feature enters as NaN ⇒ NaN margin ⇒ None
    assert(DirectionalClassifier.scoreByName(m, 200, Seq("a", "b"))(
      Map("a" -> 1.0)).isEmpty)
    // clip: a huge margin saturates to exactly 1.0, never above
    val sat = DirectionalClassifier.scoreByName(m, 200, Seq("a", "b"))(
      Map("a" -> 1e6, "b" -> 0.0))
    assert(sat === Some(1.0))
  }

  test("BarbellSizing: penalties, legacy multipliers, and the hand-computed overlay") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    import graft.stats.BarbellSizing
    def eval1(c: org.apache.spark.sql.Column): Double =
      Seq(1).toDF("x").select(c.as("v")).head().getDouble(0)

    // ratio penalty: 1.0 at/below cap; 1/(1+excess) above; floor clamp
    assert(eval1(BarbellSizing.ratioPenalty(lit(0.35), 0.35, 0.55)) === 1.0)
    assert(math.abs(eval1(BarbellSizing.ratioPenalty(lit(0.70), 0.35, 0.40))
      - 1.0 / 2.0) < 1e-12) // excess = 1, floor 0.40 below the raw penalty
    assert(eval1(BarbellSizing.ratioPenalty(lit(0.70), 0.35, 0.55))
      === 0.55) // same ratio, floor above the raw penalty ⇒ floored
    assert(eval1(BarbellSizing.ratioPenalty(lit(100.0), 0.35, 0.55)) === 0.55)
    assert(eval1(BarbellSizing.ratioPenalty(lit(null).cast("double"),
      0.35, 0.55)) === 1.0)

    // legacy per-position-cap heuristic (no explicit bucket map)
    val legacy = BarbellSizing.bucketMultipliers(
      BarbellSizing.Overlay(coreMaxPer = 0.20, specMaxPer = 0.05))
    assert(legacy("safe") === 1.0 && legacy("other") === 1.0)
    assert(math.abs(legacy("core") - 0.4) < 1e-12)
    assert(math.abs(legacy("spec") - 0.1) < 1e-12)
    // explicit map: missing keys default 1.0 (safe) / 0.85 (rest)
    val expl = BarbellSizing.bucketMultipliers(
      BarbellSizing.Overlay(bucketMult = Map("core" -> 0.9)))
    assert(expl === Map("safe" -> 1.0, "core" -> 0.9, "spec" -> 0.85,
      "other" -> 0.85))

    // end-to-end hand-computed row: core ticker, BULL regime (×1.1),
    // edge 20 bps, cost 14 bps ⇒ ratio 0.7, penalty 1/(1+1) = 0.5
    // floored UP to 0.55; lev 1.25 ⇒ leg 0.8 (not the min) ⇒ market
    // 0.55; path risk FAILS on cost ratio 0.7 > hard cap 0.35
    val o = BarbellSizing.Overlay(
      bucketMult = Map("safe" -> 1.0, "core" -> 0.9, "spec" -> 0.7),
      regimeMult = Map("BULL" -> Map("core" -> 1.1)))
    val row = Seq(("VIEW", 0.5, "bull")).toDF("ticker", "conf", "regime")
    val r = BarbellSizing.ratios(lit(0.002), lit(3), lit(14.0),
      lit(null).cast("double"), lit(1.25), lit(null).cast("double"),
      lit(null).cast("double"), lit(null).cast("double"))
    val c = BarbellSizing.applyConfidence(col("ticker"), col("conf"),
      col("regime"), r, o, safe = Seq("click"),
      core = Seq("purchase", "view"), spec = Seq("error"))
    val out = row.select(c("bucket"), c("bucket_mult"), c("regime_mult"),
      c("market_mult"), c("effective_confidence"), c("path_risk_ok")).head()
    assert(out.getString(0) === "core")
    assert(out.getDouble(1) === 0.9)
    assert(math.abs(out.getDouble(2) - 1.1) < 1e-12)
    assert(math.abs(out.getDouble(3) - 0.55) < 1e-12) // floored cost leg
    assert(math.abs(out.getDouble(4) - 0.5 * (0.9 * 1.1 * 0.55)) < 1e-9)
    assert(out.getBoolean(5) === false) // cost ratio 0.7 > hard cap 0.35

    // no context legs at all: market 1.0, path risk vacuously ok
    val rEmpty = BarbellSizing.ratios(lit(null).cast("double"),
      lit(null).cast("int"), lit(null).cast("double"),
      lit(null).cast("double"), lit(null).cast("double"),
      lit(null).cast("double"), lit(null).cast("double"),
      lit(null).cast("double"))
    val c2 = BarbellSizing.applyConfidence(col("ticker"), col("conf"),
      lit(null).cast("string"), rEmpty, o, Seq("click"),
      Seq("purchase", "view"), Seq("error"))
    val out2 = row.select(c2("market_mult"), c2("path_risk_ok"),
      c2("regime_mult")).head()
    assert(out2.getDouble(0) === 1.0)
    assert(out2.getBoolean(1) === true)
    assert(out2.getDouble(2) === 1.0)
  }

  test("barbellProject enforces caps, floors, and total preservation") {
    val buckets = Array("safe", "spec", "core", "other", "core")
    def bsum(w: Array[Double], b: String) =
      PortfolioMath.barbellBucketSum(w, buckets, b)

    // Already feasible: risk 0.3 ≤ 0.45, core 0.2 ≤ 0.28, spec 0.1 ≤
    // 0.15, safe 0.5 ≥ 0.35 — a strict no-op (renorm branch not taken).
    val feasible = Array(0.5, 0.1, 0.1, 0.2, 0.1)
    assert(PortfolioMath.barbellProject(feasible, buckets,
      riskMax = 0.45, coreMax = 0.28, specMax = 0.15, safeMin = 0.35)
      .sameElements(feasible))

    // All branches fire: uniform 0.2 ⇒ risk 0.6 > 0.45, then core
    // 0.3 > 0.28, spec 0.15 > 0.10, safe 0.2 < 0.35. Hand-replay:
    // risk ×0.75 ⇒ core .3/spec .15; caps ⇒ core .28/spec .10; safe
    // deficit .15 over donor pool (total−safe = .8) shrinks non-safe
    // ×.8125 and boosts safe to .35 (post-floor sum .82125); the final
    // renorm ×(1/.82125) restores total 1.
    val w0 = Array(0.2, 0.2, 0.2, 0.2, 0.2)
    val w = PortfolioMath.barbellProject(w0, buckets,
      riskMax = 0.45, coreMax = 0.28, specMax = 0.10, safeMin = 0.35)
    assert(math.abs(w.sum - 1.0) < 1e-12)          // total preserved
    assert(w.forall(_ >= 0.0))
    val fs = 1.0 / 0.82125
    assert(math.abs(w(0) - 0.35 * fs) < 1e-9)                 // safe
    assert(math.abs(w(1) - 0.10 * 0.8125 * fs) < 1e-9)        // spec
    assert(math.abs(w(2) - 0.14 * 0.8125 * fs) < 1e-9)        // core half
    assert(math.abs(w(3) - 0.20 * 0.8125 * fs) < 1e-9)        // other
    assert(bsum(w, "safe") >= 0.35 - 1e-9)         // floor met

    // coreMax = 0 disables the core cap (the reference's chained
    // `core > core_max > 0` comparison). Reference quirk preserved:
    // the final renorm restores the TOTAL even when that pushes the
    // risk bucket back above riskMax (here 0.8-sum → ×1.25 ⇒ risk 0.5).
    val w2 = PortfolioMath.barbellProject(w0, buckets,
      riskMax = 0.45, coreMax = 0.0, specMax = 0.10, safeMin = 0.0)
    assert(bsum(w2, "core") > 0.28)                // not core-capped
    assert(math.abs(
      (bsum(w2, "core") + bsum(w2, "spec")) - 0.5) < 1e-9)

    // zero safe holdings: deficit cannot be redistributed into safe
    // (safe_current = 0 skips the boost), but donors still shrink and
    // the final renorm restores the original total
    val noSafe = Array(0.0, 0.25, 0.25, 0.25, 0.25)
    val w3 = PortfolioMath.barbellProject(noSafe, buckets,
      riskMax = 1.0, coreMax = 0.0, specMax = 0.0, safeMin = 0.3)
    assert(bsum(w3, "safe") === 0.0)
    assert(math.abs(w3.sum - 1.0) < 1e-12)

  }
}
