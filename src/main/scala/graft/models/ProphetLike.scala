package graft.models

import graft.core.SeriesFrame._
import graft.functions.FeatureOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `prophet_like` — the NAMED estimator for the reference's `prophet`
  * (/root/reference/src/scalecast/models.py:1275-1401), as the documented
  * Spark-native substitution (SURVEY §2.5): prophet's additive model
  * y = g(t) + s(t) + h(t) + ε with
  *
  *  - g(t): piecewise-linear growth → a single linear trend here (no MCMC
  *    changepoints — deterministic and exactly reproducible by the oracle),
  *  - s(t): seasonality as a Fourier series of order `fourierOrder` over the
  *    row index at period `m` (prophet's own seasonality representation),
  *  - h(t): holidays → caller-supplied 0/1 regressor columns (`extra`,
  *    built with [[graft.functions.FeatureOps.addIntervalDummy]]).
  *
  * The curve is fit by the exact OLS used everywhere (`prophet_like` in the
  * MLlib registry = LinearRegression, normal solver), so prediction is fully
  * VECTORIZED over observed and horizon rows — no AR recursion, matching
  * prophet's curve-extrapolation character. One fit + one transform per
  * frame: scales to any series count.
  */
object ProphetLike {

  /** Fourier angular coefficient for order k at period m — computed once on
    * the driver so the oracle can splice the IDENTICAL double literal. */
  def omega(k: Int, m: Double): Double = 2.0 * math.Pi * k / m

  /** Add trend + Fourier feature columns; returns (frame, feature names). */
  def features(df: DataFrame, m: Double = 12.0, fourierOrder: Int = 2,
               extra: Seq[String] = Nil): (DataFrame, Seq[String]) = {
    val withT = FeatureOps.addTimeTrend(df)
    val withF = (1 to fourierOrder).foldLeft(withT)((f, k) =>
      f.withColumn(s"p${k}sin", sin(lit(omega(k, m)) * col("t")))
        .withColumn(s"p${k}cos", cos(lit(omega(k, m)) * col("t"))))
    val feats = Seq("t") ++
      (1 to fourierOrder).flatMap(k => Seq(s"p${k}sin", s"p${k}cos")) ++ extra
    (withF, feats)
  }

  /** Fit on observed (non-test) rows, score everywhere incl. the horizon.
    * The fit is [[Ols]]'s one-aggregation closed form (identical normal-
    * equation math to the registry's `prophet_like` MLlib entry, minus the
    * per-fit scheduler overhead), and prediction is a pure expression. */
  def forecast(frame: DataFrame, m: Double = 12.0, fourierOrder: Int = 2,
               extra: Seq[String] = Nil): DataFrame = {
    val (df, feats) = features(frame, m, fourierOrder, extra)
    val fit = Ols.fit(df, feats)
    df.withColumn("yhat", fit.predictExpr)
  }
}
