package graft.forecast

import breeze.linalg.{DenseMatrix, DenseVector}

/** Exogenous-regressor support for the AR/SARIMAX kernel — rebuild of
  * the reference's SARIMAX exog path: the exog matrix builder feeds
  * features+macro columns into the model and a VIF-based pruner drops
  * collinear ones first (/root/reference/forcester_ts/forecaster.py:
  * 307-402 `_build_sarimax_exog`, :403-479 `_prune_exog_features_vif`).
  *
  * Pure per-ticker math (normal equations via [[LinAlg.solveSpd]] — no
  * LAPACK, see graft-concurrency notes); Spark parallelizes across
  * tickers in the engine kernel.
  */
object Exog {

  final case class ArxFit(p: Int, intercept: Double, arCoefs: Array[Double],
      exogCoefs: Array[Double], keptExog: Seq[Int], sigma2: Double, aic: Double)

  /** Iterative VIF pruning (forecaster.py:403-479): while any feature's
    * variance-inflation factor exceeds `maxVif`, drop the worst one.
    * VIF_j = 1 / (1 − R²_j) from regressing column j on the others.
    * Returns the indices of KEPT columns, in order. */
  def vifPrune(cols: Array[Array[Double]], maxVif: Double = 10.0): Seq[Int] = {
    require(cols.forall(_.length == cols.head.length), "ragged exog columns")
    var kept = cols.indices.toVector
    var done = false
    while (!done && kept.size > 1) {
      val vifs = kept.map { j =>
        val others = kept.filterNot(_ == j)
        j -> vifOf(cols(j), others.map(cols))
      }
      val (worstIdx, worstVif) = vifs.maxBy(_._2)
      if (worstVif > maxVif) kept = kept.filterNot(_ == worstIdx)
      else done = true
    }
    kept
  }

  /** First-pass VIF of every column against the others (diagnostic
    * surface of the pruner — the values the reference logs before
    * dropping, forecaster.py:430-452). */
  def vifReport(cols: Array[Array[Double]]): Seq[Double] =
    cols.indices.map(j => vifOf(cols(j), cols.indices.filterNot(_ == j).map(cols)))

  /** Design-matrix row i of [1, xs...] — shared by the normal-equation
    * accumulators below. */
  private def designRow(xs: Seq[Array[Double]], i: Int): Array[Double] = {
    val row = new Array[Double](xs.size + 1)
    row(0) = 1.0
    var j = 0
    while (j < xs.size) { row(j + 1) = xs(j)(i); j += 1 }
    row
  }

  /** Explicit ascending-i normal equations (X'X, X'y): each entry is an
    * independent row-ascending sum, so an external SQL oracle carries
    * every accumulator through ONE recursion over rows (no breeze gemm —
    * its accumulation order is unspecified; the Ssa.mm rationale). */
  private def normalEq(rows: Int, design: Int => Array[Double],
      target: Int => Double): (DenseMatrix[Double], DenseVector[Double]) = {
    val k = design(0).length
    val xtx = DenseMatrix.zeros[Double](k, k)
    val xty = DenseVector.zeros[Double](k)
    var i = 0
    while (i < rows) {
      val r = design(i)
      val y = target(i)
      var a = 0
      while (a < k) {
        var b = a
        while (b < k) { xtx(a, b) += r(a) * r(b); b += 1 }
        xty(a) += r(a) * y
        a += 1
      }
      i += 1
    }
    var a = 1
    while (a < k) {
      var b = 0
      while (b < a) { xtx(a, b) = xtx(b, a); b += 1 }
      a += 1
    }
    (xtx, xty)
  }

  private def vifOf(y: Array[Double], xs: Seq[Array[Double]]): Double = {
    val n = y.length
    val (xtx, xty) = normalEq(n, designRow(xs, _), y(_))
    val beta = LinAlg.solveSpd(xtx, xty)
    val my = y.sum / n
    val ssTot = y.map(v => (v - my) * (v - my)).sum
    var ssRes = 0.0
    var i = 0
    while (i < n) {
      val r = designRow(xs, i)
      var fit = 0.0
      var j = 0
      while (j < r.length) { fit += r(j) * beta(j); j += 1 }
      val e = y(i) - fit
      ssRes += e * e
      i += 1
    }
    if (ssTot <= 1e-300) Double.PositiveInfinity
    else {
      val r2 = math.min(1.0 - 1e-12, math.max(0.0, 1.0 - ssRes / ssTot))
      1.0 / (1.0 - r2)
    }
  }

  /** ARX(p): OLS of y_t on [1, y_{t−1..t−p}, x_t·] — the "SARIMAX with
    * exog" regression core. Exog columns are VIF-pruned first; the fit
    * records which were kept so forecasting feeds the same subset. */
  def fitArx(y: Array[Double], exog: Array[Array[Double]], p: Int,
      maxVif: Double = 10.0): ArxFit = {
    require(p >= 1 && y.length > p + exog.length + 2, "series too short for ARX")
    require(exog.forall(_.length == y.length), "exog length mismatch")
    val kept = if (exog.isEmpty) Seq.empty[Int] else vifPrune(exog, maxVif)
    val xs = kept.map(exog)
    val n = y.length - p
    val k = 1 + p + xs.size
    def row(i: Int): Array[Double] = {
      val t = i + p
      val r = new Array[Double](k)
      r(0) = 1.0
      var l = 1
      while (l <= p) { r(l) = y(t - l); l += 1 }
      var j = 0
      while (j < xs.size) { r(1 + p + j) = xs(j)(t); j += 1 }
      r
    }
    val (xtx, xty) = normalEq(n, row, i => y(i + p))
    val beta = LinAlg.solveSpd(xtx, xty)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val r = row(i)
      var fit = 0.0
      var j = 0
      while (j < k) { fit += r(j) * beta(j); j += 1 }
      val e = y(i + p) - fit
      ss += e * e
      i += 1
    }
    val sigma2 = math.max(1e-12, ss / n)
    val ll = -0.5 * n * (math.log(2 * math.Pi * sigma2) + 1)
    ArxFit(p, beta(0), Array.tabulate(p)(l => beta(1 + l)),
      Array.tabulate(xs.size)(j => beta(1 + p + j)), kept,
      sigma2, 2.0 * (k + 1) - 2.0 * ll)
  }

  /** Recursive h-step ARX forecast; `futureExog` supplies the kept
    * columns' future values, one row per horizon step (the caller built
    * them exactly as the reference builds its forecast-window exog). */
  def forecast(y: Array[Double], fit: ArxFit, futureExog: Array[Array[Double]],
      horizon: Int): Array[Double] = {
    require(futureExog.length >= horizon || fit.keptExog.isEmpty,
      "futureExog must cover the horizon")
    val hist = scala.collection.mutable.ArrayBuffer(y.toSeq: _*)
    Array.tabulate(horizon) { h =>
      var pred = fit.intercept
      (1 to fit.p).foreach(l => pred += fit.arCoefs(l - 1) * hist(hist.length - l))
      if (fit.keptExog.nonEmpty)
        fit.exogCoefs.zipWithIndex.foreach { case (c, j) => pred += c * futureExog(h)(j) }
      hist += pred
      pred
    }
  }
}
