package graft.models

import graft.core.SeriesFrame._
import graft.functions.FeatureOps
import graft.operators.{FittedTransform, Transforms}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `tbats_like` — the NAMED estimator standing in for the reference's
  * `tbats` (/root/reference/src/scalecast/models.py:1061-1147, sktime
  * TBATS), under the same documented-substitution policy as [[ProphetLike]].
  * TBATS = Trigonometric seasonality, Box-Cox, ARMA errors, Trend, Seasonal
  * components; here:
  *
  *  - **Box-Cox**: per-series MLE λ over a candidate grid
  *    ([[Transforms.boxcoxMleT]] — one distributed moments pass);
  *  - **Trend**: linear trend on the transformed scale;
  *  - **Trigonometric seasonality**: Fourier pairs per seasonal period —
  *    MULTIPLE periods supported, which is the capability users reach for
  *    TBATS to get;
  *  - **ARMA error correction**: [[forecastArma]] composes a Hannan–Rissanen
  *    ARMA(p, q) fit ([[Arima]]) on the Box-Cox-scale residuals of the
  *    trend+Fourier curve — the reference TBATS's error model, estimated by
  *    the engine's deterministic two-stage OLS rather than the iterative
  *    state-space filter (documented substitution, same policy as the rest
  *    of this estimator). [[forecast]] stays curve-only.
  *
  * The curve is fit by exact OLS on the Box-Cox scale (one moments job),
  * prediction is fully vectorized over observed ∪ horizon rows, and both
  * actuals and forecasts revert through the fitted λ — so the whole
  * estimator is two aggregations + pure expressions at any series count.
  */
object TbatsLike {

  /** The shared Box-Cox + trend + Fourier curve: transform, feature build,
    * exact-OLS fit, and the scored curve column `scoredAs` — ONE
    * implementation consumed by both entry points so the curve policy
    * (λ grid, train slice, feature naming) can never diverge between them. */
  private def curve(frame: DataFrame, periods: Seq[Double], fourierOrder: Int,
                    lambdaCandidates: Seq[Double], scoredAs: String)
      : (FittedTransform, DataFrame) = {
    require(periods.nonEmpty, "tbats_like needs at least one seasonal period")
    val t = Transforms.boxcoxMleT(frame, lambdaCandidates)
    val bc = t.transform(frame)
    val withT = FeatureOps.addTimeTrend(bc)
    val withF = periods.zipWithIndex.foldLeft(withT) { case (f, (m, pi)) =>
      (1 to fourierOrder).foldLeft(f)((g, k) =>
        g.withColumn(s"tb${pi}s$k", sin(lit(ProphetLike.omega(k, m)) * col("t")))
          .withColumn(s"tb${pi}c$k", cos(lit(ProphetLike.omega(k, m)) * col("t"))))
    }
    val feats = "t" +: periods.indices.flatMap(pi =>
      (1 to fourierOrder).flatMap(k => Seq(s"tb${pi}s$k", s"tb${pi}c$k")))
    val fit = Ols.fit(withF, feats)
    (t, withF.withColumn(scoredAs, fit.predictExpr))
  }

  /** The scored-curve column name [[curveFit]] emits. */
  val CurveCol = "_fb"

  /** [[curve]] exposed for SESSION-LEVEL MEMOIZATION: [[forecast]] and
    * [[forecastArma]] fit the IDENTICAL Box-Cox + trend + Fourier curve, so
    * a caller running both on the same frame (the bench session does) can
    * fit once, checkpoint, and feed [[forecastFromCurve]] /
    * [[forecastArmaFromCurve]]. Returns the fitted λ transform and the
    * feature frame with the scored curve in [[CurveCol]]. */
  def curveFit(frame: DataFrame, periods: Seq[Double] = Seq(12.0),
               fourierOrder: Int = 2,
               lambdaCandidates: Seq[Double] = (-20 to 20).map(_ / 10.0))
      : (FittedTransform, DataFrame) =
    curve(frame, periods, fourierOrder, lambdaCandidates, CurveCol)

  def forecast(frame: DataFrame, periods: Seq[Double] = Seq(12.0),
               fourierOrder: Int = 2,
               lambdaCandidates: Seq[Double] = (-20 to 20).map(_ / 10.0)): DataFrame = {
    val (t, curveDf) = curveFit(frame, periods, fourierOrder, lambdaCandidates)
    forecastFromCurve(t, curveDf, frame.columns.toSeq)
  }

  /** Curve-only forecast from a precomputed [[curveFit]] result. */
  def forecastFromCurve(t: FittedTransform, curveDf: DataFrame,
                        origCols: Seq[String]): DataFrame = {
    val outCols = (origCols :+ "yhat").map(col)
    t.revert(curveDf.withColumnRenamed(CurveCol, "yhat"), Seq(Y, "yhat"))
      .select(outCols: _*)
  }

  /** [[forecast]] + ARMA(p, q) error correction on the Box-Cox scale (the
    * reference TBATS's full error model, models.py:1061-1147): the
    * trend+Fourier curve's transformed-scale residuals become a series in
    * their own right, [[Arima.fitArma]] fits them (two-stage Hannan–Rissanen,
    * both stages exact OLS), and the correction — one-step fitted values on
    * observed rows, the flat-innovation recursion on the horizon — adds to
    * the curve BEFORE reverting through λ. Rows where the ARMA lags aren't
    * available (series head) fall back to the uncorrected curve. Still a
    * fixed number of moments aggregations + pure expressions: no per-row
    * driver work at any series length. */
  def forecastArma(frame: DataFrame, periods: Seq[Double] = Seq(12.0),
                   fourierOrder: Int = 2, p: Int = 1, q: Int = 1,
                   lambdaCandidates: Seq[Double] = (-20 to 20).map(_ / 10.0)): DataFrame = {
    val (t, curveDf) = curveFit(frame, periods, fourierOrder, lambdaCandidates)
    forecastArmaFromCurve(t, curveDf, frame.columns.toSeq, p, q)
  }

  /** [[forecastArma]] from a precomputed [[curveFit]] result. */
  def forecastArmaFromCurve(t: FittedTransform, curveDf: DataFrame,
                            origCols: Seq[String], p: Int = 1, q: Int = 1): DataFrame = {
    val outCols = (origCols :+ "yhat").map(col)
    // residual series on the transformed scale; horizon rows stay null-y so
    // the ARMA horizon recursion forecasts them. is_test (when present)
    // rides along: Arima's two training stages must exclude the holdout
    // exactly like the curve fit did, or the error model leaks test rows
    // into test-slice metrics and conformal widths.
    val residCols = Seq(col(SeriesId), col(Ds),
      (col(Y) - col("_fb")).as(Y), col(IsFuture)) ++
      (if (curveDf.columns.contains("is_test")) Seq(col("is_test")) else Nil)
    val resid = curveDf.select(residCols: _*)
    val corr = Arima.forecast(Arima.fitArma(resid, p, q))
      .select(col(SeriesId), col(Ds), col("yhat").as("_rhat"))
    val scored = curveDf.join(corr, Seq(SeriesId, Ds), "left")
      .withColumn("yhat", col("_fb") + coalesce(
        when(isnan(col("_rhat")), lit(null)).otherwise(col("_rhat")), lit(0.0)))
      .drop("_fb", "_rhat")
    t.revert(scored, Seq(Y, "yhat")).select(outCols: _*)
  }
}
