package graft.models

import graft.core.SeriesFrame._
import org.apache.spark.ml.Transformer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multivariate forecasting — the reference's `SKLearnMV`
  * (/root/reference/src/scalecast/models.py:164-420): every target series is
  * modeled on the lags of ALL series (a VAR-by-OLS when the estimator is
  * linear), with one model per target and a shared recursive prediction loop
  * where each step's predictions for every series feed the next step's lag
  * matrix (models.py:368-407).
  *
  * Features follow the naming convention `xlag_<sid>_<k>` = lag k of series
  * `sid`, built wide (one pivot on the shared calendar — requires
  * [[graft.core.SeriesFrame.lineUpDates]] first) and joined back long.
  */
object MvForecast {

  def xlagCol(sid: String, k: Int): String = s"xlag_${sid}_$k"

  /** Add lags 1..maxLag of every series as feature columns on every row. */
  def addCrossSeriesLags(df: DataFrame, seriesIds: Seq[String], maxLag: Int): DataFrame = {
    val wide = df.groupBy(Ds).pivot(SeriesId, seriesIds).agg(first(Y))
    // the wide frame has ONE row per date — a driver-sized calendar, so the
    // unpartitioned window is bounded (dates, not rows×series)
    val ww = org.apache.spark.sql.expressions.Window.orderBy(Ds)
    val withLags = seriesIds.foldLeft(wide)((f, sid) =>
      (1 to maxLag).foldLeft(f)((g, k) =>
        g.withColumn(xlagCol(sid, k), lag(col(sid), k).over(ww))))
    val lagCols = for (sid <- seriesIds; k <- 1 to maxLag) yield xlagCol(sid, k)
    df.join(withLags.select((Ds +: lagCols).map(col): _*), Seq(Ds), "left")
  }

  /** Fit one estimator per target series on the cross-series lag features
    * (train = observed, non-test, feature-complete rows of that series). */
  def fitPerSeries(frame: DataFrame, seriesIds: Seq[String], maxLag: Int,
                   algo: String = "mlr"): Map[String, Transformer] = {
    val feats = for (sid <- seriesIds; k <- 1 to maxLag) yield xlagCol(sid, k)
    seriesIds.map { sid =>
      sid -> (MllibTsEstimator(algo, feats)
        .fit(frame.filter(col(SeriesId) === sid)): Transformer)
    }.toMap
  }

  /** MV dynamic forecast: h steps; at each step every series' step-i row has
    * its cross-lags filled from the shared ledger (actuals ∪ all series'
    * predictions so far), then each target's own model scores its row.
    * Set-based over series within a step; h × |series| small jobs. */
  def dynamicForecast(frame: DataFrame, models: Map[String, Transformer],
                      seriesIds: Seq[String], maxLag: Int): DataFrame = {
    val withT = frame.withColumn("_t", row_number().over(w)).localCheckpoint(true)
    val obs = withT.filter(!col(IsFuture))
    val fittedParts = seriesIds.map(sid => models(sid).transform(obs.filter(col(SeriesId) === sid)))
    val fitted = fittedParts.reduce(_ unionByName _)

    val fut = withT.filter(col(IsFuture))
      .withColumn("_step", row_number().over(w)).localCheckpoint(true)
    val maxStep = {
      val r = fut.agg(max("_step")).first()
      if (r.isNullAt(0)) 0 else r.getInt(0)
    }
    // bounded ledger: only the last (maxLag + h) values per series are joinable
    val lastT = obs.groupBy(SeriesId).agg(max("_t").as("_maxT"))
    var known = obs.join(lastT, Seq(SeriesId))
      .filter(col("_t") > col("_maxT") - (maxLag + maxStep))
      .select(col(SeriesId), col("_t"), col(Y).as("_v")).localCheckpoint(true)
    var preds = List.empty[DataFrame]
    for (i <- 1 to maxStep) {
      var rows = fut.filter(col("_step") === i)
      for (sid <- seriesIds; k <- 1 to maxLag) {
        val c = xlagCol(sid, k)
        val lagged = known.filter(col(SeriesId) === sid)
          .select((col("_t") + k).as("_t"), col("_v").as(c))
        rows = rows.drop(c).join(lagged, Seq("_t"), "left")
      }
      val scored = seriesIds.map(sid =>
          models(sid).transform(rows.filter(col(SeriesId) === sid)))
        .reduce(_ unionByName _).localCheckpoint(true)
      known = known.unionByName(
        scored.select(col(SeriesId), col("_t"), col("yhat").as("_v"))).localCheckpoint(true)
      preds ::= scored
    }
    val out = preds.foldLeft(fitted)((acc, p) =>
      acc.unionByName(p.select(fitted.columns.map(col).toSeq: _*)))
    out.drop("_t", "_step", "_fraw", "_f")
  }
}
