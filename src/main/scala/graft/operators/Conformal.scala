package graft.operators

import graft.core.Joins.maybeBroadcast
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
    df.join(maybeBroadcast(widths), Seq(SeriesId), "left")
      .withColumn("lower", col(yhat) - col("ci_width"))
      .withColumn("upper", col(yhat) + col("ci_width"))
  }

  def minTestLength(cilevel: Double): Int = math.ceil(1.0 / (1.0 - cilevel)).toInt

  /** Grouped conformal attachment for the by-series POINT-forecast paths —
    * [[graft.models.GroupedOls]], [[graft.models.Svr.fitPredictBySeries]],
    * [[graft.models.MlpNet.fitPredictBySeries]],
    * [[graft.models.RnnNet.fitPredictBySeries]] all return
    * (series_id, ds, yhat) with no holdout metadata, so the reference's CI
    * contract (Forecaster.py:188-208) couldn't attach at the 10⁶-series
    * tier. This re-joins `y`/`is_test`/`is_future` from the flagged input
    * frame (one join keyed by (series, ds)), then runs the SAME
    * one-aggregation-per-series percentile as [[withIntervals]] — widths
    * join back size-gated. Series whose holdout is empty get null bounds
    * (the per-series skip policy), never a cross-series width. */
  def attachBySeries(flagged: DataFrame, scored: DataFrame,
                     yhat: String = "yhat", cilevel: Double = 0.95): DataFrame = {
    // fail loudly, not with all-null bounds: without the holdout flag there
    // are no calibration residuals, so every width would be silently null —
    // a caller who forgot withTestFlag should hear about it here
    require(flagged.columns.contains("is_test"),
      "attachBySeries needs an is_test column on the flagged frame " +
        "(apply SeriesFrame.withTestFlag first) — without a holdout slice " +
        "every conformal width would be null")
    val meta = flagged.select(col(SeriesId), col(Ds), col(Y), col(IsFuture),
      col("is_test"))
    withIntervals(scored.join(meta, Seq(SeriesId, Ds), "left"), yhat, cilevel)
  }

  /** Extract the per-series CI widths of a scored frame (for reuse). */
  def widthsOf(df: DataFrame, yhat: String = "yhat", cilevel: Double = 0.95): DataFrame =
    df.filter(col("is_test") && col(yhat).isNotNull && col(Y).isNotNull)
      .groupBy(SeriesId)
      .agg(expr(s"percentile(abs($Y - $yhat), $cilevel)").as("ci_width"))

  /** `transfer_cis` (/root/reference/src/scalecast/_Forecaster_parent.py:
    * 295-361): apply widths computed on one forecaster/frame to another's
    * predictions. */
  def transferIntervals(target: DataFrame, widths: DataFrame,
                        yhat: String = "yhat"): DataFrame =
    target.join(maybeBroadcast(widths), Seq(SeriesId), "left")
      .withColumn("lower", col(yhat) - col("ci_width"))
      .withColumn("upper", col(yhat) + col("ci_width"))

  /** Dynamic (per-step) conformal intervals from a backtest residual matrix
    * (`backtest_for_resid_matrix` → `overwrite_forecast_intervals`,
    * /root/reference/src/scalecast/util.py:1157-1270): collect |residual|
    * per (iteration, horizon step) from backtest-scored frames, take the
    * cilevel-percentile per step across iterations, and attach step-indexed
    * bounds to the horizon rows of `forecast`. Widths widen with the step —
    * unlike the flat width of [[withIntervals]]. */
  def dynamicIntervals(backtestScored: Seq[DataFrame], forecast: DataFrame,
                       yhat: String = "yhat", cilevel: Double = 0.95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // horizon-step index within each scored run's test slice
    val stepW = Window.partitionBy(col(SeriesId)).orderBy(col(Ds))
    val resids = backtestScored.zipWithIndex.map { case (df, i) =>
      df.filter(col("is_test") && col(yhat).isNotNull && col(Y).isNotNull)
        .withColumn("_step", row_number().over(stepW))
        .select(col(SeriesId), col("_step"), abs(col(Y) - col(yhat)).as("_r"))
        .withColumn("_iter", lit(i))
    }.reduce(_ unionByName _)
    val widths = resids.groupBy(SeriesId, "_step")
      .agg(expr(s"percentile(_r, $cilevel)").as("_w"))
    forecast.withColumn("_step",
        when(col(IsFuture), row_number().over(
          Window.partitionBy(col(SeriesId), col(IsFuture)).orderBy(col(Ds)))))
      .join(maybeBroadcast(widths), Seq(SeriesId, "_step"), "left")
      .withColumn("lower", col(yhat) - col("_w"))
      .withColumn("upper", col(yhat) + col("_w"))
      .drop("_step", "_w")
  }
}
