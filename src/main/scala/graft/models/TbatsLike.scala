package graft.models

import graft.core.SeriesFrame._
import graft.functions.FeatureOps
import graft.operators.Transforms
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
  *  - **ARMA error correction: omitted** (documented) — it requires an
  *    iterative state-space fit; residual structure is available by
  *    composing the registry's `arima` estimator on the transformed series.
  *
  * The curve is fit by exact OLS on the Box-Cox scale (one moments job),
  * prediction is fully vectorized over observed ∪ horizon rows, and both
  * actuals and forecasts revert through the fitted λ — so the whole
  * estimator is two aggregations + pure expressions at any series count.
  */
object TbatsLike {

  def forecast(frame: DataFrame, periods: Seq[Double] = Seq(12.0),
               fourierOrder: Int = 2,
               lambdaCandidates: Seq[Double] = (-20 to 20).map(_ / 10.0)): DataFrame = {
    require(periods.nonEmpty, "tbats_like needs at least one seasonal period")
    val outCols = (frame.columns :+ "yhat").toSeq.map(col)
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
    val scored = withF.withColumn("yhat", fit.predictExpr)
    t.revert(scored, Seq(Y, "yhat")).select(outCols: _*)
  }
}
