package graft.sources

import java.sql.Timestamp
import java.time.LocalDate

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.domain.Bar

/** Deterministic synthetic OHLCV source — the rebuild of the reference's
  * regime-switching simulator (/root/reference/etl/synthetic_extractor.py:
  * 77-715): a Markov regime chain (:482-493) drives per-bar paths from a
  * selectable model family — GBM, OU mean-reversion, Merton
  * jump-diffusion, Heston stochastic vol (:494-641) — with event
  * impacts (:641-655), day-of-week seasonality (:656-659), and
  * correlated cross-asset shocks (:672-682).
  *
  * Scale design: a price path is a sequential recurrence, so each ticker
  * is generated inside one task from its own seed (`seed ^ ticker.hash`) —
  * ticker-parallel, no shuffle, no driver loop. Cross-asset correlation
  * deliberately does NOT use the reference's Cholesky-of-the-universe
  * (that couples every ticker and caps parallelism): a ONE-FACTOR model
  * draws a shared market shock as a pure hash of (seed, barIndex), which
  * every task recomputes locally — corr(i, j) = ρ for all pairs with no
  * communication, on a million tickers as cheaply as on five. Same seed
  * ⇒ identical data on any cluster layout because randomness never
  * crosses task boundaries.
  *
  * Draw plumbing: every random draw the simulator makes goes through a
  * [[SyntheticSource.Draws]] stream. The default is the seeded
  * `java.util.Random` stream (bar-for-bar identical to the original
  * generator); the oracle gates swap in [[SyntheticSource.LcgDraws]], a
  * minstd LCG whose every state transition is one 64-bit multiply-mod —
  * replayable draw-for-draw by a SQL recursive CTE in BIGINT arithmetic
  * (the q159 Monte Carlo pattern, extended to the regime chain and the
  * OHLCV span/volume draws so the ENTIRE path recurrence is under the
  * hash gate, not just the shock).
  */
object SyntheticSource {

  /** One ticker's private random stream. All simulator draws route
    * through this, in a FIXED per-bar order (regime uniform, shock,
    * model-specific draws, event draws, span, volume) — pluggable
    * implementations must be advanced exactly once per call. */
  trait Draws extends Serializable {
    def nextInt(n: Int): Int
    def nextDouble(): Double
    def nextGaussian(): Double
  }

  /** Default stream: seeded `scala.util.Random` — identical draw
    * sequence to the pre-refactor simulator. Not SQL-replayable
    * (48-bit hidden state, Gaussian rejection loop) — spec-covered. */
  final class RandomDraws(seed: Long) extends Draws {
    private val r = new Random(seed)
    def nextInt(n: Int): Int = r.nextInt(n)
    def nextDouble(): Double = r.nextDouble()
    def nextGaussian(): Double = r.nextGaussian()
  }

  /** Minstd-LCG stream for the oracle gates: s ← 16807·s mod (2³¹−1).
    * Every product fits a signed 64-bit integer, so an external SQL
    * oracle replays the identical stream with plain BIGINT arithmetic.
    * `nextGaussian` here is a BOUNDED uniform-derived shock in (−2, 2)
    * — not a Gaussian; the gate specifies the generator, the Gaussian
    * default stays spec-covered (its Marsaglia loop has no SQL replay). */
  final class LcgDraws(seed0: Long) extends Draws {
    private var s = java.lang.Math.floorMod(seed0, 2147483646L) + 1L
    private def adv(): Long = { s = (16807L * s) % 2147483647L; s }
    def nextInt(n: Int): Int = (adv() % n).toInt
    def nextDouble(): Double = adv().toDouble / 2147483647.0
    def nextGaussian(): Double = (adv().toDouble / 2147483647.0 - 0.5) * 4.0
  }

  sealed trait Regime { def drift: Double; def vol: Double }
  case object Bull extends Regime { val drift = 0.0008; val vol = 0.010 }
  case object Bear extends Regime { val drift = -0.0006; val vol = 0.018 }
  case object Choppy extends Regime { val drift = 0.0001; val vol = 0.025 }

  private val regimes = Vector(Bull, Bear, Choppy)
  // row-stochastic regime transition matrix (stay-heavy, like the
  // reference's _simulate_regimes)
  private val transition = Vector(
    Vector(0.97, 0.02, 0.01),
    Vector(0.03, 0.95, 0.02),
    Vector(0.02, 0.03, 0.95))

  /** Path-model family + market structure knobs (defaults reproduce the
    * original plain-GBM generator bar-for-bar: extra draws only happen
    * when a feature is enabled).
    *
    *  - model: "gbm" | "ou" (log-price mean-reversion, speed `ouKappa`)
    *    | "merton" (GBM + compound Poisson jumps) | "heston" (CIR
    *    variance, full-truncation Euler)
    *  - marketCorr: ρ of the one-factor cross-asset shock (0 = off)
    *  - eventProb: per-bar probability of an idiosyncratic event that
    *    kicks the bar return by `eventShock`·N(−1, 1) and triples vol
    *    for the next 3 bars (the reference's event-impact window)
    *  - seasonality: Mon/Fri volume+vol multipliers (reference :656-659)
    */
  final case class Config(
      model: String = "gbm",
      marketCorr: Double = 0.0,
      ouKappa: Double = 0.05,
      jumpProb: Double = 0.02,
      jumpMean: Double = -0.02,
      jumpStd: Double = 0.05,
      hestonKappa: Double = 0.10,
      hestonXi: Double = 0.25,
      eventProb: Double = 0.0,
      eventShock: Double = 0.04,
      seasonality: Boolean = false)

  def generate(
      spark: SparkSession,
      tickers: Seq[String],
      nBars: Int,
      startDate: LocalDate = LocalDate.of(2024, 1, 1),
      seed: Long = 42L,
      basePrice: Double = 100.0,
      cfg: Config = Config(),
      drawsFor: Option[String => Draws] = None): Dataset[Bar] = {
    import spark.implicits._
    spark.createDataset(tickers)
      .repartition(math.min(tickers.size, 256), $"value")
      .flatMap(t => simulate(t, nBars, startDate, seed, basePrice, cfg,
        drawsFor.map(_(t))))
  }

  /** Like [[generate]] but over an in-plan ticker dimension — no driver
    * materialization of the ticker list, so query construction stays
    * lazy (a malformed upstream table fails at action, not at plan
    * build) and a billion-ticker universe never touches the driver. */
  def generateFrom(
      tickers: Dataset[String],
      nBars: Int,
      startDate: LocalDate = LocalDate.of(2024, 1, 1),
      seed: Long = 42L,
      basePrice: Double = 100.0,
      cfg: Config = Config(),
      drawsFor: Option[String => Draws] = None): Dataset[Bar] = {
    import tickers.sparkSession.implicits._
    tickers.flatMap(t => simulate(t, nBars, startDate, seed, basePrice, cfg,
      drawsFor.map(_(t))))
  }

  /** Content-hash dataset id (reference :398-414): order-independent
    * sha over the generated rows, so identical configs produce the same
    * id on any cluster layout. */
  def datasetId(bars: Dataset[Bar]): String = {
    val row = bars.toDF()
      .select(sha2(concat_ws("|", bars.toDF().columns.map(col): _*), 256).as("h"))
      .agg(sha2(concat_ws("", sort_array(collect_list("h"))), 256))
      .head()
    row.getString(0).take(16)
  }

  /** LAZY replayable variant of [[datasetId]]: the same order-independent
    * two-level sha construction, but over an integer-quantized projection
    * (prices on the floor(x·scale + 0.5) grid, the date as its ISO string)
    * so both engines render IDENTICAL pre-image strings — double→string
    * formatting differs between engines, BIGINT→string does not. Returns
    * the single-row aggregation instead of collecting, so oracle gates
    * can register it without an eager action at construction. */
  def datasetIdDf(bars: Dataset[Bar], scale: Double = 1e6): DataFrame = {
    def q(c: String) = floor(col(c) * scale + lit(0.5)).cast("long")
    bars.toDF()
      .select(sha2(concat_ws("|",
        col("ticker"), to_date(col("date")).cast("string"),
        q("open"), q("high"), q("low"), q("close"), col("volume")), 256).as("h"))
      .agg(substring(
        sha2(concat_ws("", sort_array(collect_list(col("h")))), 256),
        1, 16).as("dataset_id"))
  }

  /** Shared market shock for bar i — a pure function of (seed, i), so
    * every ticker's task recomputes it locally (no broadcast). */
  private[sources] def marketShock(seed: Long, i: Int): Double =
    new Random(seed * 0x9E3779B97F4A7C15L + i).nextGaussian()

  /** One ticker's full path — pure, seeded, executor-side. `draws`
    * overrides the random stream (None = the seeded Random default). */
  private[graft] def simulate(
      ticker: String,
      nBars: Int,
      startDate: LocalDate,
      seed: Long,
      basePrice: Double,
      cfg: Config = Config(),
      draws: Option[Draws] = None): Iterator[Bar] = {
    val rng: Draws =
      draws.getOrElse(new RandomDraws(seed ^ ticker.hashCode.toLong))
    var regime = rng.nextInt(regimes.size)
    var close = basePrice * (0.5 + rng.nextDouble())
    val logBase = math.log(close)
    var v = 0.0 // Heston variance state (lazily seeded from the regime)
    var eventBars = 0 // remaining vol-boosted bars after an event
    val rho = math.max(0.0, math.min(0.999, cfg.marketCorr))
    Iterator.tabulate(nBars) { i =>
      // Markov regime step
      val u = rng.nextDouble()
      val row = transition(regime)
      regime = if (u < row(0)) 0 else if (u < row(0) + row(1)) 1 else 2
      val r = regimes(regime)
      val date = startDate.plusDays(i.toLong)
      // seasonality multiplier (Mon/Fri busier, like the reference)
      val season =
        if (!cfg.seasonality) 1.0
        else date.getDayOfWeek match {
          case java.time.DayOfWeek.MONDAY => 1.15
          case java.time.DayOfWeek.FRIDAY => 1.10
          case _ => 1.0
        }
      // correlated shock: one-factor blend of the shared market draw
      val idio = rng.nextGaussian()
      val shock =
        if (rho == 0.0) idio
        else math.sqrt(rho) * marketShock(seed, i) + math.sqrt(1 - rho) * idio
      val volBoost = (if (eventBars > 0) 3.0 else 1.0) * season
      if (eventBars > 0) eventBars -= 1
      val vol = r.vol * volBoost
      val ret = cfg.model match {
        case "ou" =>
          // mean-reversion on log price toward the ticker's base level
          cfg.ouKappa * (logBase - math.log(close)) + vol * shock
        case "merton" =>
          val jump =
            if (rng.nextDouble() < cfg.jumpProb)
              cfg.jumpMean + cfg.jumpStd * rng.nextGaussian()
            else 0.0
          r.drift + vol * shock + jump
        case "heston" =>
          if (v <= 0.0) v = vol * vol
          val z2 = rng.nextGaussian()
          val theta = r.vol * r.vol * volBoost * volBoost
          v = math.max(1e-10,
            v + cfg.hestonKappa * (theta - v) + cfg.hestonXi * math.sqrt(v) * z2 * r.vol)
          r.drift + math.sqrt(v) * shock
        case _ => r.drift + vol * shock
      }
      // idiosyncratic event impact (reference :641-655)
      val event =
        if (cfg.eventProb > 0 && rng.nextDouble() < cfg.eventProb) {
          eventBars = 3
          cfg.eventShock * (rng.nextGaussian() - 1.0)
        } else 0.0
      val open = close
      close = math.max(0.01, close * math.exp(ret + event))
      val span = math.abs(rng.nextGaussian()) * vol * open
      val high = math.max(open, close) + span
      val low = math.max(0.005, math.min(open, close) - span)
      val volume = (1e5 * season * (1 + math.abs(shock)) * (1 + 0.5 * rng.nextDouble())).toLong
      Bar(ticker, Timestamp.valueOf(date.atStartOfDay),
        open, high, low, close, volume, close, "synthetic")
    }
  }
}
