package graft.forecast

/** Ensemble coordination — rebuild of /root/reference/forcester_ts/
  * ensemble.py:99-912: candidate weight sets (static + regime-specific),
  * DA-derived `auto_directional` candidate (:180-191), min-component
  * floor (:145-157), confidence scaling (:211-218), the DA
  * cap-and-redistribute penalty with its machine-checked invariants
  * (:26-98), score = Σ wᵢ·confᵢ, top-1 selection with a diversity
  * preference (:258-294), and the NaN-aware row-wise weighted blend of
  * forecasts and CIs (:296-380).
  */
object Ensemble {

  final case class Candidate(name: String, weights: Map[String, Double])
  final case class Scored(candidate: Candidate, score: Double)

  final case class Config(
      diversityTolerance: Double = 0.05,
      confidenceScaling: Boolean = true,
      daFloor: Double = 0.45,
      daWeightCap: Double = 0.10,
      trackDa: Boolean = true)

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

  /** DA-derived candidate (ensemble.py:180-191): weight proportional to
    * each model's CV directional accuracy mapped [0.40, 0.60] → [0, 1];
    * models at or below the 0.40 floor are dropped. None when no model
    * clears the floor. */
  def daCandidate(da: Map[String, Double]): Option[Candidate] = {
    val w = da.flatMap { case (m, v) =>
      val x = math.max(0.0, (v - 0.40) / 0.20)
      if (x > 0) Some(m -> x) else None
    }
    if (w.isEmpty) None else Some(Candidate("auto_directional", w))
  }

  /** DA cap-and-redistribute (ensemble.py:26-98): models whose DA is
    * below `floor` are capped at `cap` and the freed budget goes ONLY to
    * non-penalized models (proportionally; equal shares when their total
    * is ~0). Returns empty when EVERY model is penalized — callers skip
    * that candidate. Post-conditions (reference's runtime contract):
    * values in [0,1], sum ≈ 1, every penalized model ≤ cap. */
  def applyDaCap(weights: Map[String, Double], da: Map[String, Double],
      floor: Double, cap: Double): Map[String, Double] = {
    val penalized = weights.keySet.filter(m => da.getOrElse(m, 1.0) < floor)
    if (!penalized.exists(m => weights(m) > cap)) return weights
    val fixed = penalized.map(m => m -> math.min(weights(m), cap)).toMap
    val nonPen = weights.filter { case (m, _) => !penalized.contains(m) }
    if (nonPen.isEmpty) return Map.empty
    val remaining = math.max(0.0, 1.0 - fixed.values.sum)
    val npTotal = nonPen.values.sum
    val redist =
      if (npTotal > 1e-12) nonPen.map { case (m, v) => m -> v / npTotal * remaining }
      else nonPen.map { case (m, _) => m -> remaining / nonPen.size }
    fixed ++ redist
  }

  /** Full candidate pipeline (ensemble.py:158-294): regime-specific
    * candidate set → prepend the auto_directional candidate → restrict
    * to models with finite positive confidence → normalize+floor →
    * optional confidence scaling (reweight, renormalize) → DA cap →
    * score by Σ wᵢ·confᵢ → top-1 with diversity preference. None when
    * every candidate collapses (reference returns no selection). */
  def selectFull(candidates: Seq[Candidate], confidence: Map[String, Double],
      da: Map[String, Double] = Map.empty, regime: String = "",
      regimeCandidates: Map[String, Seq[Candidate]] = Map.empty,
      cfg: Config = Config()): Option[Scored] = {
    val base = regimeCandidates.getOrElse(regime, candidates)
    val withDa =
      if (cfg.trackDa) daCandidate(da).toSeq ++ base else base
    val eligible = confidence.filter { case (_, v) => !v.isNaN && v > 0 }.keySet
    val scored = withDa.flatMap { c =>
      val filt =
        if (eligible.nonEmpty) c.weights.filter { case (m, _) => eligible.contains(m) }
        else c.weights
      val n0 = normalize(filt)
      val n1 =
        if (n0.isEmpty) n0
        else if (cfg.confidenceScaling)
          normalize(n0.map { case (m, w) => m -> w * confidence.getOrElse(m, 0.0) })
        else n0
      val n2 =
        if (n1.isEmpty) n1
        else if (da.nonEmpty) applyDaCap(n1, da, cfg.daFloor, cfg.daWeightCap)
        else n1
      if (n2.isEmpty) None
      else Some(Scored(c.copy(weights = n2),
        n2.map { case (m, w) => w * confidence.getOrElse(m, 0.0) }.sum))
    }.sortBy(-_.score)
    scored.headOption.map { best =>
      if (best.candidate.weights.size >= 2) best
      else scored.find(s => s.candidate.weights.size >= 2 &&
        s.score >= best.score - cfg.diversityTolerance).getOrElse(best)
    }
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
