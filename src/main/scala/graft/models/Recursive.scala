package graft.models

import graft.core.SeriesFrame._
import graft.functions.FeatureOps
import org.apache.spark.ml.Transformer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive multi-step ("dynamic") prediction: horizon step i's AR features
  * are filled from the model's own predictions for steps < i
  * (/root/reference/src/scalecast/models.py:109-149).
  *
  * Spark-first shape: instead of a per-series driver loop, each horizon step
  * is ONE whole-frame operation — fill the AR columns of every series' step-i
  * row by joining against the accumulated (series, t, value) ledger, then
  * `model.transform` all of them at once. h steps → h small jobs total,
  * independent of the number of series: the per-step work parallelizes across
  * a million series on a cluster. (The reference's step loop is per series;
  * this is the same recursion batched series-wise.)
  */
object Recursive {

  /** Fitted values + dynamic horizon forecast.
    *
    * @param frame  observed ∪ horizon rows with AR columns (`ar_<k>`) and any
    *               deterministic features already populated on horizon rows
    * @param model  fitted pipeline producing column `yhat`
    * @return frame rows with `yhat`: vectorized for observed rows (AR cells
    *         hold actuals), recursive for horizon rows
    */
  def dynamicForecast(frame: DataFrame, model: Transformer): DataFrame = {
    val arLags = FeatureOps.arCols(frame).map(c => c.stripPrefix(FeatureOps.ArPrefix).toInt)
    // localCheckpoint after each step truncates lineage — without it the
    // h-step loop compounds the plan h-fold (heap blow-up at plan compile).
    val withT = frame.withColumn("_t", row_number().over(w)).localCheckpoint(true)
    val obs = withT.filter(!col(IsFuture))
    val fitted = model.transform(obs)

    val fut = withT.filter(col(IsFuture))
      .withColumn("_step", row_number().over(w)).localCheckpoint(true)
    val maxStep = {
      val r = fut.agg(max("_step")).first()
      if (r.isNullAt(0)) 0 else r.getInt(0)
    }

    // ledger of known values: actuals, then predictions as steps complete.
    // Only the last (maxLag + h) actuals per series can ever be referenced,
    // so trim the ledger up front — keeps the per-step join bounded at
    // series × (lags + h) rows no matter how long the history is.
    val maxLag = if (arLags.isEmpty) 0 else arLags.max
    val keep = maxLag + maxStep
    val lastT = obs.groupBy(SeriesId).agg(max("_t").as("_maxT"))
    var known = obs.join(lastT, Seq(SeriesId))
      .filter(col("_t") > col("_maxT") - keep)
      .select(col(SeriesId), col("_t"), col(Y).as("_v"))
      .localCheckpoint(true)
    var preds = List.empty[DataFrame]
    for (i <- 1 to maxStep) {
      var rows = fut.filter(col("_step") === i)
      for (k <- arLags) {
        val lagged = known.select(col(SeriesId), (col("_t") + k).as("_t"),
          col("_v").as(s"${FeatureOps.ArPrefix}$k"))
        rows = rows.drop(s"${FeatureOps.ArPrefix}$k")
          .join(lagged, Seq(SeriesId, "_t"), "left")
      }
      val scored = model.transform(rows).localCheckpoint(true)
      known = known.unionByName(
        scored.select(col(SeriesId), col("_t"), col("yhat").as("_v")))
        .localCheckpoint(true)
      preds ::= scored
    }
    val out = preds.foldLeft(fitted)((acc, p) =>
      acc.unionByName(p.select(fitted.columns.map(col).toSeq: _*)))
    out.drop("_t", "_step", "_fraw", "_f")
  }
}
