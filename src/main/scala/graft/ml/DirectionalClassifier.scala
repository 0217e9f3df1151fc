package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.stats.PortfolioMath

/** Directional (up/down) classifier — rebuild of /root/reference/
  * forcester_ts/directional_classifier.py:54-155 + its trainer
  * (scripts/train_directional_classifier.py): a calibrated logistic
  * regression over engineered features scoring P(next bar up).
  *
  * Spark-first: MLlib LogisticRegression fits distributed; Platt
  * calibration (sigmoid on the raw score vs realized outcome) refits the
  * probability map exactly like the reference's CalibratedClassifierCV.
  */
object DirectionalClassifier {

  final case class Model(
      featureCols: Seq[String],
      weights: Array[Double],
      intercept: Double,
      plattA: Double,
      plattB: Double)

  /** labeled must contain featureCols + binary `label` (1 = up). */
  def train(labeled: DataFrame, featureCols: Seq[String]): Model = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .setHandleInvalid("skip")
      .transform(labeled)
    val lr = new LogisticRegression()
      .setMaxIter(100).setRegParam(0.01).setStandardization(true)
      .setLabelCol("label").setFeaturesCol("features")
    val fitted = lr.fit(assembled)
    // raw margins for Platt calibration
    val spark = labeled.sparkSession
    import spark.implicits._
    val scored = fitted.transform(assembled)
      .select(col("rawPrediction"), col("label"))
      .as[(Vector, Double)]
      .collect()
    val margins = scored.map(_._1(1))
    val labels = scored.map(_._2.toInt)
    val (a, b) = PortfolioMath.plattFit(margins, labels)
    Model(featureCols, fitted.coefficients.toArray, fitted.intercept, a, b)
  }

  /** Calibrated P(up) for one feature row (kernel-side scoring). */
  def score(model: Model)(features: Array[Double]): Double = {
    require(features.length == model.weights.length,
      s"feature mismatch: got ${features.length}, trained on ${model.weights.length}")
    val margin = model.intercept +
      model.weights.zip(features).map { case (w, x) => w * x }.sum
    PortfolioMath.plattApply(model.plattA, model.plattB)(margin)
  }

  /** The reference's full scoring contract (directional_classifier.py:
    * 54-155): returns None — scoring DISABLED, caller falls back —
    * when the model was trained on < 30 examples (:88-94), when the
    * persisted feature order no longer matches the caller's current
    * feature list (:96-108 — the learned coefficients would silently
    * map to the wrong columns), or when the calibrated probability is
    * non-finite (:147-148). Features missing from the map enter as NaN
    * (:139 `features.get(name, nan)`), which propagates to a NaN
    * margin → None. A finite probability is clipped to [0, 1] (:149). */
  def scoreByName(model: Model, nTrain: Int, currentFeatures: Seq[String])(
      features: Map[String, Double]): Option[Double] = {
    if (nTrain < 30) None
    else if (model.featureCols != currentFeatures) None
    else {
      val x = model.featureCols.map(n => features.getOrElse(n, Double.NaN))
      val margin = model.intercept +
        model.weights.zip(x).map { case (w, v) => w * v }.sum
      val p = PortfolioMath.plattApply(model.plattA, model.plattB)(margin)
      if (p.isNaN || p.isInfinity) None
      else Some(math.max(0.0, math.min(1.0, p)))
    }
  }
}
