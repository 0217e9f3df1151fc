package graft.forecast

/** Ensemble coordination — rebuild of /root/reference/forcester_ts/
  * ensemble.py:99-912: candidate weight sets (static + regime-specific),
  * min-component-weight floor (:145-157), score = Σ wᵢ·confᵢ, top-1
  * selection with a diversity preference (:258-294), and the NaN-aware
  * row-wise weighted blend of forecasts and CIs (:296-380).
  */
object Ensemble {

  final case class Candidate(name: String, weights: Map[String, Double])
  final case class Scored(candidate: Candidate, score: Double)

  val minComponentWeight = 0.05

  /** Normalize, floor tiny weights to zero, renormalize. */
  def normalize(weights: Map[String, Double]): Map[String, Double] = {
    val pos = weights.filter(_._2 > 0)
    val total = pos.values.sum
    if (total <= 0) return Map.empty
    val floored = pos.map { case (k, v) => k -> v / total }
      .filter(_._2 >= minComponentWeight)
    val t2 = floored.values.sum
    floored.map { case (k, v) => k -> v / t2 }
  }

  /** Score candidates by Σ wᵢ·confᵢ; pick the top, but prefer a ≥2-model
    * candidate within `diversityTolerance` of the best single-model score
    * (ensemble.py:258-283). */
  def select(
      candidates: Seq[Candidate],
      confidence: Map[String, Double],
      diversityTolerance: Double = 0.05): Scored = {
    require(candidates.nonEmpty, "no ensemble candidates")
    val scored = candidates.map { c =>
      val w = normalize(c.weights)
      Scored(c.copy(weights = w),
        w.map { case (m, wt) => wt * confidence.getOrElse(m, 0.0) }.sum)
    }.sortBy(-_.score)
    val best = scored.head
    if (best.candidate.weights.size >= 2) best
    else scored.find(s => s.candidate.weights.size >= 2 &&
      s.score >= best.score - diversityTolerance).getOrElse(best)
  }

  /** NaN-aware per-step weighted blend: a model missing (or NaN at) a
    * step is dropped there and the remaining weights renormalize. */
  def blend(forecasts: Map[String, Array[Double]], weights: Map[String, Double])
      : Array[Double] = {
    val horizon = forecasts.values.map(_.length).max
    Array.tabulate(horizon) { h =>
      val avail = weights.toSeq.flatMap { case (m, w) =>
        forecasts.get(m).filter(f => h < f.length && !f(h).isNaN).map(f => (w, f(h)))
      }
      val totW = avail.map(_._1).sum
      if (totW <= 0) Double.NaN
      else avail.map { case (w, v) => w / totW * v }.sum
    }
  }
}
