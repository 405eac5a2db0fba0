package graft.models

import org.apache.spark.ml.{PipelineModel, PredictionModel, Transformer}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.{Vector, Vectors}

/** Single-row scoring view of a fitted pipeline.
  *
  * When a fitted model is structurally `[VectorAssembler, PredictionModel]`
  * (the registry's default `normalizer = "none"` shape, every linear and tree
  * estimator in [[MllibTsEstimator]]), one row can be scored on an executor
  * without a DataFrame: assemble the feature doubles in the assembler's
  * declared order and call the predictor's public `predict(Vector)` — the
  * SAME code `transform` runs per row, so results are identical.
  *
  * This is what lets [[Recursive]] collapse the h-step dynamic recursion into
  * ONE `mapGroups` pass per series (state bounded at lags + h rows) instead
  * of h whole-frame jobs: the sequential dependence lives inside a partition,
  * not across job barriers. Pipelines with scaler stages (or non-pipeline
  * models like [[KnnRegressor]]) return None and take the generic
  * whole-frame ledger path, which needs nothing but `transform`.
  */
final class RowScorer private (
    val featureCols: Seq[String],
    predictor: PredictionModel[Vector, _]) extends Serializable {

  /** Null/absent features must be NaN — matching VectorAssembler's
    * `handleInvalid = "keep"` so incomplete-lag rows score NaN, not error. */
  def score(feats: Array[Double]): Double = predictor.predict(Vectors.dense(feats))
}

object RowScorer {
  def unwrap(model: Transformer): Option[RowScorer] = model match {
    case pm: PipelineModel => pm.stages match {
      case Array(va: VectorAssembler, p: PredictionModel[Vector @unchecked, _])
          if p.getFeaturesCol == va.getOutputCol =>
        Some(new RowScorer(va.getInputCols.toSeq, p))
      case _ => None
    }
    case _ => None
  }
}
