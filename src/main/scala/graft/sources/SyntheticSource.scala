package graft.sources

import java.sql.Timestamp
import java.time.LocalDate

import scala.util.Random

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.domain.Bar

/** Deterministic synthetic OHLCV source — the rebuild of the reference's
  * regime-switching simulator (/root/reference/etl/synthetic_extractor.py:
  * 77-715: Markov regime chain :482-493 driving GBM / OU mean-reversion /
  * jump-diffusion per-bar paths :494-641).
  *
  * Scale design: a price path is a sequential recurrence, so each ticker
  * is generated inside one task from its own seed (`seed ^ ticker.hash`) —
  * ticker-parallel, no shuffle, no driver loop. At 100 TB you generate
  * millions of tickers in parallel; a single ticker's path stays a
  * single-task scan, which is the correct (and only) topology for a
  * recurrence. Same seed ⇒ identical data on any cluster layout because
  * randomness never crosses task boundaries.
  */
object SyntheticSource {

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

  def generate(
      spark: SparkSession,
      tickers: Seq[String],
      nBars: Int,
      startDate: LocalDate = LocalDate.of(2024, 1, 1),
      seed: Long = 42L,
      basePrice: Double = 100.0): Dataset[Bar] = {
    import spark.implicits._
    spark.createDataset(tickers)
      .repartition(math.min(tickers.size, 256), $"value")
      .flatMap(t => simulate(t, nBars, startDate, seed, basePrice))
  }

  /** One ticker's full path — pure, seeded, executor-side. */
  private[sources] def simulate(
      ticker: String,
      nBars: Int,
      startDate: LocalDate,
      seed: Long,
      basePrice: Double): Iterator[Bar] = {
    val rng = new Random(seed ^ ticker.hashCode.toLong)
    var regime = rng.nextInt(regimes.size)
    var close = basePrice * (0.5 + rng.nextDouble())
    Iterator.tabulate(nBars) { i =>
      // Markov regime step
      val u = rng.nextDouble()
      val row = transition(regime)
      regime = if (u < row(0)) 0 else if (u < row(0) + row(1)) 1 else 2
      val r = regimes(regime)
      // GBM bar with intrabar range
      val shock = rng.nextGaussian()
      val ret = r.drift + r.vol * shock
      val open = close
      close = math.max(0.01, close * math.exp(ret))
      val span = math.abs(rng.nextGaussian()) * r.vol * open
      val high = math.max(open, close) + span
      val low = math.max(0.005, math.min(open, close) - span)
      val volume = (1e5 * (1 + math.abs(shock)) * (1 + 0.5 * rng.nextDouble())).toLong
      Bar(ticker, Timestamp.valueOf(startDate.plusDays(i.toLong).atStartOfDay),
        open, high, low, close, volume, close, "synthetic")
    }
  }
}
