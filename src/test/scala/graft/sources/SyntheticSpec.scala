package graft.sources

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Each synthetic path family must show its defining statistical
  * signature (deterministically — everything is seeded): OU reverts,
  * Merton fattens tails, Heston clusters volatility, the one-factor
  * market shock correlates tickers, events spike vol, seasonality
  * lifts Monday volume. Default config must stay bar-for-bar identical
  * to the original plain-GBM generator (cache fixtures depend on it). */
class SyntheticSpec extends AnyFunSuite with TestSpark {

  private val d0 = LocalDate.of(2024, 1, 1)

  private def path(ticker: String, cfg: SyntheticSource.Config, n: Int = 1500,
      seed: Long = 7L): Array[Double] =
    SyntheticSource.simulate(ticker, n, d0, seed, 100.0, cfg).map(_.close).toArray

  private def rets(p: Array[Double]): Array[Double] =
    p.sliding(2).map(a => math.log(a(1) / a(0))).toArray

  private def kurtosis(x: Array[Double]): Double = {
    val m = x.sum / x.length
    val s2 = x.map(v => (v - m) * (v - m)).sum / x.length
    x.map(v => math.pow(v - m, 4)).sum / x.length / (s2 * s2)
  }

  private def corr(a: Array[Double], b: Array[Double]): Double = {
    val ma = a.sum / a.length; val mb = b.sum / b.length
    val num = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
    val da = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum)
    val db = math.sqrt(b.map(y => (y - mb) * (y - mb)).sum)
    num / (da * db)
  }

  test("default config is bar-for-bar the plain GBM generator (deterministic)") {
    val a = SyntheticSource.simulate("AAPL", 300, d0, 42L, 100.0).toSeq
    val b = SyntheticSource.simulate("AAPL", 300, d0, 42L, 100.0,
      SyntheticSource.Config()).toSeq
    assert(a === b)
  }

  test("OU paths stay near their base level while GBM paths wander") {
    val tickers = (1 to 12).map(i => s"T$i")
    def terminalSpread(cfg: SyntheticSource.Config): Double = {
      val logRatios = tickers.map { t =>
        val p = path(t, cfg, n = 2000)
        math.abs(math.log(p.last / p.head))
      }
      logRatios.sum / logRatios.size
    }
    val ou = terminalSpread(SyntheticSource.Config(model = "ou"))
    val gbm = terminalSpread(SyntheticSource.Config(model = "gbm"))
    assert(ou < gbm * 0.6, s"ou=$ou gbm=$gbm")
  }

  test("Merton jumps fatten the return tails vs GBM") {
    val kJump = kurtosis(rets(path("X", SyntheticSource.Config(model = "merton", jumpProb = 0.05))))
    val kGbm = kurtosis(rets(path("X", SyntheticSource.Config(model = "gbm"))))
    assert(kJump > kGbm + 1.0, s"merton=$kJump gbm=$kGbm")
  }

  test("Heston variance clusters: |r| autocorrelation exceeds GBM's") {
    def absAcf1(cfg: SyntheticSource.Config): Double = {
      val a = rets(path("H", cfg, n = 3000)).map(math.abs)
      corr(a.dropRight(1), a.drop(1))
    }
    val h = absAcf1(SyntheticSource.Config(model = "heston", hestonXi = 0.6))
    val g = absAcf1(SyntheticSource.Config(model = "gbm"))
    assert(h > g + 0.03, s"heston=$h gbm=$g")
  }

  test("one-factor market shock correlates tickers at ~rho, zero without") {
    val cfgC = SyntheticSource.Config(marketCorr = 0.8)
    val c = corr(rets(path("AAA", cfgC)), rets(path("BBB", cfgC)))
    assert(c > 0.5, s"corr=$c")
    val cfg0 = SyntheticSource.Config()
    val c0 = corr(rets(path("AAA", cfg0)), rets(path("BBB", cfg0)))
    assert(math.abs(c0) < 0.2, s"corr0=$c0")
  }

  test("event impacts fatten tails; seasonality lifts Monday volume") {
    val kEvent = kurtosis(rets(path("E", SyntheticSource.Config(eventProb = 0.04))))
    val kBase = kurtosis(rets(path("E", SyntheticSource.Config())))
    assert(kEvent > kBase + 0.5, s"event=$kEvent base=$kBase")

    val bars = SyntheticSource.simulate("S", 1400, d0, 9L, 100.0,
      SyntheticSource.Config(seasonality = true)).toSeq
    def meanVol(dow: java.time.DayOfWeek): Double = {
      val vs = bars.filter(_.date.toLocalDateTime.getDayOfWeek == dow).map(_.volume.toDouble)
      vs.sum / vs.size
    }
    assert(meanVol(java.time.DayOfWeek.MONDAY) > 1.05 * meanVol(java.time.DayOfWeek.WEDNESDAY))
  }

  test("datasetId is content-deterministic and seed-sensitive") {
    val a = SyntheticSource.generate(spark, Seq("A", "B"), 50, seed = 1L)
    val b = SyntheticSource.generate(spark, Seq("A", "B"), 50, seed = 1L)
    val c = SyntheticSource.generate(spark, Seq("A", "B"), 50, seed = 2L)
    val (ia, ib, ic) = (SyntheticSource.datasetId(a), SyntheticSource.datasetId(b),
      SyntheticSource.datasetId(c))
    assert(ia === ib)
    assert(ia != ic)
  }

  test("generateFrom matches generate bar-for-bar (in-plan ticker dim)") {
    import spark.implicits._
    val viaSeq = SyntheticSource.generate(spark, Seq("A", "B"), 40, seed = 5L)
      .collect().sortBy(b => (b.ticker, b.date.getTime)).toSeq
    val viaDs = SyntheticSource.generateFrom(
        spark.createDataset(Seq("A", "B")), 40, seed = 5L)
      .collect().sortBy(b => (b.ticker, b.date.getTime)).toSeq
    assert(viaSeq === viaDs)
  }

  test("LcgDraws path is deterministic, seed-sensitive, and distinct from the Random default") {
    def lcgPath(seed0: Long): Seq[Double] =
      SyntheticSource.simulate("A", 60, d0, 42L, 100.0,
        SyntheticSource.Config(),
        draws = Some(new SyntheticSource.LcgDraws(seed0))).map(_.close).toSeq
    assert(lcgPath(7L) === lcgPath(7L))
    assert(lcgPath(7L) != lcgPath(8L))
    val default = SyntheticSource.simulate("A", 60, d0, 42L, 100.0)
      .map(_.close).toSeq
    assert(lcgPath(7L) != default)
    // negative seed0 must not throw (floorMod normalization in the ctor)
    assert(lcgPath(-3L).length === 60)
  }

  test("datasetIdDf is order/layout-independent and equals itself across partitionings") {
    val bars = SyntheticSource.generate(spark, Seq("A", "B", "C"), 30, seed = 9L)
    val id1 = SyntheticSource.datasetIdDf(bars).head().getString(0)
    val id2 = SyntheticSource.datasetIdDf(
      bars.repartition(7)).head().getString(0)
    assert(id1 === id2)
    assert(id1.length === 16)
    val other = SyntheticSource.datasetIdDf(
      SyntheticSource.generate(spark, Seq("A", "B", "C"), 30, seed = 10L))
      .head().getString(0)
    assert(id1 != other)
  }
}
