package graft.forecast

import scala.util.Random

/** Seeded Monte Carlo path simulation over a forecast — rebuild of
  * /root/reference/forcester_ts/monte_carlo_simulator.py:19-190:
  * per-step drift from the point forecast, σ from the vol forecast (or
  * CI half-width / z), clipped Gaussian shocks, quantile bands and
  * P(up). Deterministic for a fixed seed.
  *
  * Paths are embarrassingly parallel: for huge nPaths distribute with
  * spark.range(nPaths) and a path-index-derived seed; at the reference's
  * 1000 paths the in-kernel loop is the right tool.
  */
object MonteCarlo {

  final case class Summary(expected: Array[Double], median: Array[Double],
      p05: Array[Double], p95: Array[Double], probUp: Double)

  /** `shock`: optional replacement shock source (path, step) => raw
    * shock, still clipped at ±clipSigmas — lets callers swap the seeded
    * Gaussian for a counter-based generator (e.g. the oracle gate's
    * integer LCG, replayable in any engine). None = seeded Gaussian. */
  def simulate(
      lastPrice: Double,
      forecast: Array[Double],
      vol: Array[Double],
      nPaths: Int = 1000,
      seed: Long = 42L,
      clipSigmas: Double = 4.0,
      shock: Option[(Int, Int) => Double] = None): Summary = {
    val horizon = forecast.length
    require(vol.length == horizon, "vol/forecast length mismatch")
    // per-step drift implied by the point forecast path
    val drifts = Array.tabulate(horizon) { h =>
      val prev = if (h == 0) lastPrice else forecast(h - 1)
      if (prev != 0) forecast(h) / prev - 1 else 0.0
    }
    val terminal = new Array[Double](nPaths)
    val byStep = Array.ofDim[Double](horizon, nPaths)
    var p = 0
    while (p < nPaths) {
      val rng = new Random(seed + p) // path-indexed seed ⇒ order-free determinism
      var price = lastPrice
      var h = 0
      while (h < horizon) {
        val raw = shock match {
          case Some(f) => f(p, h)
          case None => rng.nextGaussian()
        }
        val sh = math.max(-clipSigmas, math.min(clipSigmas, raw))
        price = math.max(1e-9, price * (1 + drifts(h) + vol(h) * sh))
        byStep(h)(p) = price
        h += 1
      }
      terminal(p) = price
      p += 1
    }
    def q(a: Array[Double], frac: Double): Double = {
      val s = a.sorted
      s(math.min(s.length - 1, math.floor(frac * (s.length - 1)).toInt))
    }
    Summary(
      expected = byStep.map(step => step.sum / nPaths),
      median = byStep.map(q(_, 0.5)),
      p05 = byStep.map(q(_, 0.05)),
      p95 = byStep.map(q(_, 0.95)),
      probUp = terminal.count(_ > lastPrice).toDouble / nPaths)
  }
}
