package graft.models

import graft.core.Joins.maybeBroadcast
import graft.core.SeriesFrame._
import graft.operators.Transforms
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Standard Theta method (θ = 2) — the reference's `theta` estimator
  * (/root/reference/src/scalecast/models.py:880-968, darts FourTheta is a
  * generalization). Decomposition:
  *
  *   Z_0(t)  = a + b·t                  (theta-0 line: linear trend)
  *   Z_2(t)  = 2·y(t) − Z_0(t)          (theta-2 line: doubled curvature)
  *   ŷ       = ½ (Z_0 extrapolation + SES(Z_2))
  *
  * All pieces are existing engine operators: closed-form per-series OLS for
  * the trend (broadcast-joined params) and the distributed SES recursion —
  * no new sequential code. */
object Theta {

  def thetaForecast(frame: DataFrame, alpha: Double = 0.3): DataFrame = {
    val detrend = Transforms.detrendLinearT(frame)
    // z2 = 2y − trend, kept alongside the original y
    val withT = frame.withColumn("_t", row_number().over(w))
      .join(maybeBroadcast(detrend.params), Seq(SeriesId), "left")
      .withColumn("_trend", col("intercept") + col("slope") * col("_t"))
      .withColumn("_y_orig", col(Y))
      .withColumn(Y, lit(2) * col(Y) - col("_trend"))
    val ses = Smoothing.ses(withT.select(SeriesId, Ds, Y, IsFuture), alpha)
      .withColumnRenamed("yhat", "_ses")
      .select(col(SeriesId), col(Ds), col("_ses"))
    withT.join(ses, Seq(SeriesId, Ds), "left")
      .withColumn("yhat", (col("_trend") + col("_ses")) / 2.0)
      .withColumn(Y, col("_y_orig"))
      .drop("_t", "slope", "intercept", "_trend", "_y_orig", "_ses")
  }
}
