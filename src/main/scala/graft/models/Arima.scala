package graft.models

import graft.core.SeriesFrame._
import graft.functions.FeatureOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ARMA(p, q) estimation via Hannan–Rissanen — the reference's `arima`
  * estimator re-expressed without statsmodels' iterative CSS/MLE
  * (/root/reference/src/scalecast/models.py:1150-1273; SURVEY §2.5 calls for
  * a closed-form-reachable slice): two OLS stages, both distributed.
  *
  *  1. Fit a long AR(L) by OLS, L ≥ p+q, and take its residuals ê_t as
  *     innovation estimates.
  *  2. Regress y_t on y_(t−1..p) and ê_(t−1..q) — linear in all parameters,
  *     so plain OLS yields (φ, θ).
  *
  * Differencing (the "I" part) composes with [[graft.operators.Transforms.diffT]]
  * and its exact revert. Forecasting: future innovations are zero, past ones
  * are the stage-1 residuals, so horizon MA-lag cells can be pre-filled and
  * only the AR recursion needs the step loop ([[Recursive.dynamicForecast]]).
  */
object Arima {

  final case class ArmaFit(model: org.apache.spark.ml.PipelineModel,
                           p: Int, q: Int, prepared: DataFrame)

  /** Fit ARMA(p, q) on the observed slice; `prepared` carries the y-lag and
    * residual-lag feature columns for scoring/forecasting. */
  def fitArma(frame: DataFrame, p: Int, q: Int, longAr: Int = 0): ArmaFit = {
    val L = if (longAr > 0) longAr else p + q + 4
    // stage 1: long-AR residuals as innovation estimates
    val withLongAr = FeatureOps.addArTerms(frame, L)
    val stage1 = MllibTsEstimator("mlr", (1 to L).map(i => s"ar_$i")).fit(withLongAr)
    val resid = stage1.transform(withLongAr)
      .withColumn("_e", when(isnan(col("yhat")) || col("yhat").isNull, lit(null))
        .otherwise(col(Y) - col("yhat")))
      .drop("yhat", "_fraw", "_f")
    // stage 2 features: y lags (recursive-fillable ar_*) + innovation lags.
    // Horizon elag_j: the j-step-back innovation while it is an observed one
    // (first j steps), else 0 — future innovations have expectation 0.
    // Observed rows keep null elags at the series head so stage-2 training
    // drops them rather than learning from fake zeros.
    val noAr = resid.drop((1 to L).map(i => s"ar_$i"): _*)
    val withELags = (1 to q).foldLeft(noAr)((f, j) =>
      f.withColumn(s"elag_$j",
        when(col(IsFuture), coalesce(lag(col("_e"), j).over(w), lit(0.0)))
          .otherwise(lag(col("_e"), j).over(w))))
    val prepared = FeatureOps.addArLags(withELags, 1 to p)
    val feats = (1 to p).map(i => s"ar_$i") ++ (1 to q).map(j => s"elag_$j")
    val stage2 = MllibTsEstimator("mlr", feats).fit(prepared)
    ArmaFit(stage2, p, q, prepared)
  }

  /** Fitted values + recursive dynamic horizon forecast. */
  def forecast(fit: ArmaFit): DataFrame =
    Recursive.dynamicForecast(fit.prepared, fit.model)
}
