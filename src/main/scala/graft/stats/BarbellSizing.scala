package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Barbell confidence-sizing overlay — rebuild of
  * /root/reference/risk/barbell_sizing.py (:129-163 bucket +
  * multipliers, :165-175 ratio penalty, :190-268 market-context
  * multiplier, :270-321 path-risk audit, :324-356
  * apply_barbell_confidence) as PURE Column arithmetic: every rule is
  * per-row scalar math, so the whole overlay stays inside whole-stage
  * codegen — no UDF, no kernel, no shuffle; at 100 TB it is a free
  * rider on whatever scan carries the signal rows.
  *
  * Null columns mirror the reference's `None` short-circuits: a leg
  * whose inputs are missing contributes no multiplier and no path-risk
  * check (Spark's `least` and `coalesce` skip nulls exactly like the
  * reference's list-of-present-multipliers).
  */
object BarbellSizing {

  /** confidence_overlays config (the reference reads it from
    * barbell.yml). `bucketMult` empty ⇒ the legacy per-position-cap
    * heuristic (coreMaxPer/specMaxPer vs the 0.50 safe cap). */
  final case class Overlay(
      bucketMult: Map[String, Double] = Map.empty,
      coreMaxPer: Double = 0.0,
      specMaxPer: Double = 0.0,
      softCaps: Map[String, Double] = Map(
        "roundtrip_cost_to_edge" -> 0.35, "gap_risk_to_edge" -> 0.75,
        "funding_to_edge" -> 0.25, "liquidity_to_depth" -> 0.10),
      floors: Map[String, Double] = Map(
        "cost" -> 0.55, "gap" -> 0.50, "funding" -> 0.70,
        "liquidity" -> 0.65, "leverage" -> 0.60),
      regimeMult: Map[String, Map[String, Double]] = Map.empty)

  /** Resolved per-bucket confidence multipliers (barbell_sizing.py
    * :141-163): the explicit map when present (missing keys default to
    * 1.0 for safe, 0.85 otherwise), else the legacy per-position-cap
    * heuristic clamped to [0, 1]. */
  def bucketMultipliers(o: Overlay): Map[String, Double] =
    if (o.bucketMult.nonEmpty) {
      val r = o.bucketMult.map { case (k, v) => k.trim.toLowerCase -> v }
      Seq("safe", "core", "spec", "other").map(k =>
        k -> r.getOrElse(k, if (k == "safe") 1.0 else 0.85)).toMap
    } else Map(
      "safe" -> 1.0,
      "core" -> math.max(0.0, math.min(1.0, o.coreMaxPer / 0.50)),
      "spec" -> math.max(0.0, math.min(1.0, o.specMaxPer / 0.50)),
      "other" -> 1.0)

  /** barbell_bucket (:129-138): upper-cased symbol membership. */
  def bucketOf(ticker: Column, safe: Seq[String], core: Seq[String],
      spec: Seq[String]): Column = {
    val s = upper(ticker)
    def in(set: Seq[String]) =
      if (set.isEmpty) lit(false) else s.isin(set.map(_.toUpperCase): _*)
    when(in(safe), "safe").when(in(core), "core")
      .when(in(spec), "spec").otherwise("other")
  }

  /** _ratio_penalty (:165-175): 1.0 when the ratio is null, the cap is
    * non-positive, or ratio ≤ cap; else 1/(1+excess) clamped to
    * [floor, 1] with excess = max(0, (ratio − cap)/cap). */
  def ratioPenalty(ratio: Column, softCap: Double, floor: Double): Column =
    if (softCap <= 0) lit(1.0)
    else when(ratio.isNull || ratio <= softCap, lit(1.0))
      .otherwise(greatest(lit(floor), least(lit(1.0),
        lit(1.0) / (lit(1.0) +
          greatest(lit(0.0), (ratio - lit(softCap)) / lit(softCap))))))

  /** The context ratios the market multiplier and the path-risk audit
    * both consume (the reference's `diagnostics`). Null = leg absent. */
  final case class Ratios(edge: Column, edgeBps: Column, cost: Column,
      gap: Column, funding: Column, liquidity: Column, leverage: Column)

  /** Diagnostics ratios from a market context (:190-240): each ratio is
    * null unless its reference branch fired. `leverage` follows
    * `float(x) or 1.0` (null/0 ⇒ 1), horizon `max(int(h or 1), 1)`. */
  def ratios(expectedReturnNet: Column, horizonBars: Column,
      roundtripCostBps: Column, gapRiskPct: Column, leverage: Column,
      fundingBpsPerDay: Column, depthNotional: Column,
      orderNotional: Column): Ratios = {
    val edge = abs(coalesce(expectedReturnNet, lit(0.0)))
    val edgeBps = when(edge > 0, edge * lit(1e4))
    val horizon = greatest(coalesce(
      when(horizonBars === 0, lit(1)).otherwise(horizonBars).cast("int"),
      lit(1)), lit(1))
    val lev = when(leverage.isNull || leverage === 0.0, lit(1.0))
      .otherwise(leverage)
    Ratios(
      edge = edge,
      edgeBps = edgeBps,
      cost = when(edgeBps.isNotNull && roundtripCostBps.isNotNull,
        roundtripCostBps / edgeBps),
      gap = when(edge > 0 && gapRiskPct.isNotNull, gapRiskPct / edge),
      funding = when(edgeBps.isNotNull && fundingBpsPerDay.isNotNull,
        (fundingBpsPerDay * horizon) / edgeBps),
      liquidity = when(depthNotional.isNotNull && orderNotional.isNotNull
        && depthNotional > 0, orderNotional / depthNotional),
      leverage = lev)
  }

  /** _market_context_multiplier (:190-268): min over the PRESENT leg
    * penalties (least skips null legs, exactly like the reference's
    * list of appended multipliers), clamped to [0, 1]; 1.0 when no leg
    * fired. */
  def marketMultiplier(r: Ratios, o: Overlay): Column = {
    def cap(k: String) = o.softCaps.getOrElse(k, 0.0)
    def fl(k: String, d: Double) = o.floors.getOrElse(k, d)
    val legs = Seq(
      when(r.cost.isNotNull,
        ratioPenalty(r.cost, cap("roundtrip_cost_to_edge"), fl("cost", 0.55))),
      when(r.gap.isNotNull,
        ratioPenalty(r.gap, cap("gap_risk_to_edge"), fl("gap", 0.50))),
      when(r.funding.isNotNull,
        ratioPenalty(r.funding, cap("funding_to_edge"), fl("funding", 0.70))),
      when(r.liquidity.isNotNull,
        ratioPenalty(r.liquidity, cap("liquidity_to_depth"),
          fl("liquidity", 0.65))),
      when(r.leverage > 1.0, greatest(lit(fl("leverage", 0.60)),
        least(lit(1.0), lit(1.0) / r.leverage))))
    coalesce(
      greatest(lit(0.0), least(lit(1.0), least(legs: _*))),
      lit(1.0))
  }

  /** _regime_multiplier (:177-187): regime map lookup (upper-cased),
    * 1.0 when the regime is absent/blank or unmapped. */
  /** The literal `map(entries: _*)` below embeds one expression pair
    * per (regime, bucket) cell, so the PLAN grows with the config —
    * the ExactKMeans k=80 plan-growth class (analysis + Janino cost ∝
    * parameter, ~50 s of overhead for sub-second work once the
    * parameter is large). A regime map is a small enum × bucket CONFIG
    * (the reference's barbell.yml has ~5 regimes × ≤4 buckets), never
    * data-derived, so the bound is enforced here rather than by a
    * broadcast-join twin; `ExplainAudit --plansize` pins both the
    * growth and this cap. */
  private[graft] val maxRegimeCells = 64

  def regimeMultiplier(regime: Column, bucket: Column,
      o: Overlay): Column = {
    if (o.regimeMult.isEmpty) lit(1.0)
    else {
      val cells = o.regimeMult.valuesIterator.map(_.size).sum
      require(cells <= maxRegimeCells,
        s"regimeMult has $cells (regime, bucket) cells > $maxRegimeCells: " +
          "the literal map() plan grows with the config — a map this " +
          "large is not a config; join a broadcast lookup table instead")
      val entries = o.regimeMult.toSeq.sortBy(_._1).flatMap {
        case (reg, byBucket) => byBucket.toSeq.sortBy(_._1).flatMap {
          case (b, v) =>
            Seq(lit(reg.toUpperCase + "|" + b), lit(v))
        }
      }
      coalesce(
        element_at(map(entries: _*),
          concat(upper(coalesce(regime, lit(""))), lit("|"), bucket)),
        lit(1.0))
    }
  }

  /** evaluate_barbell_path_risk (:270-321): every PRESENT ratio must sit
    * at or under its hard cap (the soft caps double as the audit bounds;
    * leverage's default cap is 1/floor). Absent legs are skipped; no
    * legs ⇒ ok. */
  def pathRiskOk(r: Ratios, o: Overlay): Column = {
    def cap(k: String) = o.softCaps.get(k)
    val levCap = o.softCaps.getOrElse("leverage",
      1.0 / math.max(o.floors.getOrElse("leverage", 0.60), 1e-6))
    val checks = Seq(
      cap("roundtrip_cost_to_edge").map(c => r.cost <= c),
      cap("gap_risk_to_edge").map(c => r.gap <= c),
      cap("funding_to_edge").map(c => r.funding <= c),
      cap("liquidity_to_depth").map(c => r.liquidity <= c),
      Some(r.leverage <= levCap)).flatten
    checks.map(c => coalesce(c, lit(true))).reduce(_ && _)
  }

  /** apply_barbell_confidence (:324-356): bucket × regime × market
    * multipliers on a [0,1]-clamped base confidence. Returns the gate's
    * column set. */
  def applyConfidence(ticker: Column, baseConfidence: Column,
      regime: Column, r: Ratios, o: Overlay,
      safe: Seq[String], core: Seq[String], spec: Seq[String])
      : Map[String, Column] = {
    val bucket = bucketOf(ticker, safe, core, spec)
    val bm = bucketMultipliers(o)
    val bMult = Seq("safe", "core", "spec", "other")
      .foldLeft(lit(1.0))((acc, k) =>
        when(bucket === k, lit(bm(k))).otherwise(acc))
    val regM = regimeMultiplier(regime, bucket, o)
    val mktM = marketMultiplier(r, o)
    val mult = bMult * regM * mktM
    val conf = greatest(lit(0.0), least(lit(1.0), baseConfidence))
    Map(
      "bucket" -> bucket,
      "bucket_mult" -> bMult,
      "regime_mult" -> regM,
      "market_mult" -> mktM,
      "multiplier" -> mult,
      "effective_confidence" ->
        greatest(lit(0.0), least(lit(1.0), conf * mult)),
      "path_risk_ok" -> pathRiskOk(r, o))
  }
}
