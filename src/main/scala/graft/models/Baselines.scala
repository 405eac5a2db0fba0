package graft.models

import graft.core.Joins.maybeBroadcast
import graft.core.SeriesFrame._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Closed-form baseline models — the reference's `naive` estimator family
  * (/root/reference/src/scalecast/models.py:1403-1490), its `combo` averager
  * (models.py:1493-1648), and a trend+seasonal OLS that reproduces the
  * "mlr + trend + Fourier/dummy" pattern the reference leans on. All pure
  * DataFrame work: window lags, broadcast joins of tiny per-series parameter
  * frames, no driver collects — the same plan scales to millions of series.
  */
object Baselines {

  /** (Seasonal) naive fitted values: yhat = y shifted by m
    * (models.py:1403-1447; m=1 is plain naive). */
  def naiveFitted(df: DataFrame, m: Int = 1, yhat: String = "yhat"): DataFrame =
    df.withColumn(yhat, lag(col(Y), m).over(w))

  /** (Seasonal) naive horizon forecast: tile the last m observed values over
    * the future rows (models.py:1473-1476). Join by phase — set-based. */
  def naiveForecast(df: DataFrame, m: Int = 1, yhat: String = "yhat"): DataFrame = {
    val obs = df.filter(!col(IsFuture))
      .withColumn("_rn_back", row_number().over(Window.partitionBy(SeriesId).orderBy(col(Ds).desc)))
    val lastCycle = obs.filter(col("_rn_back") <= m)
      .withColumn("_phase", pmod(col("_rn_back") - 1, lit(m)))
      .select(col(SeriesId), col("_phase"), col(Y).as("_tile"))
    // horizon step i (1-based): phase of the tiled value = (m - 1 - (i-1)) mod m
    val fut = df.filter(col(IsFuture))
      .withColumn("_step", row_number().over(w))
      .withColumn("_phase", pmod(lit(m) - col("_step"), lit(m)))
      .join(maybeBroadcast(lastCycle), Seq(SeriesId, "_phase"), "left")
      .withColumn(yhat, col("_tile"))
      .drop("_step", "_phase", "_tile")
    unionLoose(naiveFitted(df.filter(!col(IsFuture)), m, yhat), fut.drop("_rn_back"))
  }

  /** Per-series linear trend params fit on non-test observed rows: closed-form
    * OLS of y on the row index (slope = cov(t,y)/var(t)). */
  def trendParams(df: DataFrame, trainOnly: Boolean = true): DataFrame = {
    val hasTest = df.columns.contains("is_test")
    val base = df.filter(!col(IsFuture))
      .withColumn("_t", row_number().over(w).cast("double"))
    val train = if (trainOnly && hasTest) base.filter(!col("is_test")) else base
    train.groupBy(SeriesId).agg(
      (covar_samp(col("_t"), col(Y)) / var_samp(col("_t"))).as("slope"),
      (avg(Y) - covar_samp(col("_t"), col(Y)) / var_samp(col("_t")) * avg("_t")).as("intercept"))
  }

  /** Trend + monthly-effect OLS model: y ≈ a + b·t + effect(month). Fit on
    * the train slice (leakage-safe), predict everywhere incl. horizon. The
    * decomposable closed form keeps it exactly reproducible by the oracle. */
  def trendSeasonal(df: DataFrame, yhat: String = "yhat"): DataFrame = {
    val withT = df.withColumn("_t", row_number().over(w).cast("double"))
      .withColumn("_month", month(col(Ds)))
    val params = trendParams(df)
    val joined = withT.join(maybeBroadcast(params), Seq(SeriesId), "left")
      .withColumn("_trend", col("intercept") + col("slope") * col("_t"))
    val hasTest = joined.columns.contains("is_test")
    val trainRows = if (hasTest) joined.filter(!col(IsFuture) && !col("is_test"))
                    else joined.filter(!col(IsFuture))
    val effects = trainRows.groupBy(SeriesId, "_month")
      .agg(avg(col(Y) - col("_trend")).as("_effect"))
    joined.join(maybeBroadcast(effects), Seq(SeriesId, "_month"), "left")
      .withColumn(yhat, col("_trend") + coalesce(col("_effect"), lit(0.0)))
      .drop("_t", "_month", "slope", "intercept", "_trend", "_effect")
  }

  /** `combo`: simple average of prior models' prediction columns
    * (models.py:1604-1633); weighted variant takes (col, weight) pairs. */
  def comboAvg(df: DataFrame, yhatCols: Seq[String], out: String = "yhat_combo"): DataFrame =
    df.withColumn(out, yhatCols.map(col).reduce(_ + _) / yhatCols.size)

  def comboWeighted(df: DataFrame, weighted: Seq[(String, Double)], out: String = "yhat_combo"): DataFrame = {
    val wsum = weighted.map(_._2).sum
    df.withColumn(out, weighted.map { case (c, wt) => col(c) * wt }.reduce(_ + _) / wsum)
  }

  /** The reference's metric-derived weighting (models.py:1604-1617):
    * weight_i ∝ score_i / Σ scores, and when the metric is lower-is-better
    * the weight list is REVERSED — with models ordered worst→best by the
    * metric this hands the best model the largest share (the reference's
    * worst-inverted trick, reproduced faithfully). */
  def comboMetricWeighted(df: DataFrame, yhatCols: Seq[String],
                          scores: Seq[Double], lowerIsBetter: Boolean = true,
                          out: String = "yhat_combo"): DataFrame = {
    require(yhatCols.size == scores.size, "one score per prediction column")
    val total = scores.sum
    val w0 = scores.map(_ / total)
    val w = if (lowerIsBetter) w0.reverse else w0
    comboWeighted(df, yhatCols.zip(w), out)
  }
}
