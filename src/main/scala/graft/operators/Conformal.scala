package graft.operators

import graft.core.SeriesFrame._
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Conformal prediction intervals (SURVEY.md §2.7):
  * width = empirical (cilevel)-percentile of |test-set residuals|;
  * Upper/Lower = point ± width, applied to both test predictions and the
  * horizon forecast (/root/reference/src/scalecast/Forecaster.py:188-208).
  * Requires test_length ≥ 1/(1−cilevel)
  * (/root/reference/src/scalecast/_Forecaster_parent.py:104-116).
  *
  * Exact `percentile` (linear interpolation — numpy.percentile parity) per
  * (series, model); the per-series width frame is tiny and broadcast back.
  */
object Conformal {

  /** Compute per-series CI widths from rows flagged `is_test` with prediction
    * column `yhat`, then attach `lower`/`upper` around `yhat` everywhere. */
  def withIntervals(df: DataFrame, yhat: String = "yhat", cilevel: Double = 0.95): DataFrame = {
    val widths = df.filter(col("is_test") && col(yhat).isNotNull && col(Y).isNotNull)
      .groupBy(SeriesId)
      .agg(expr(s"percentile(abs($Y - $yhat), $cilevel)").as("ci_width"))
    df.join(broadcast(widths), Seq(SeriesId), "left")
      .withColumn("lower", col(yhat) - col("ci_width"))
      .withColumn("upper", col(yhat) + col("ci_width"))
  }

  def minTestLength(cilevel: Double): Int = math.ceil(1.0 / (1.0 - cilevel)).toInt
}
