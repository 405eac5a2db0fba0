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

  /** Add lags 1..maxLag of every series as feature columns on every row.
    *
    * Lag semantics are over the UNION calendar (a date any series has): each
    * series is densified onto the shared date spine (missing dates → null y)
    * and lagged inside its OWN window partition — so every window is
    * partitioned by series_id and the plan scales with #series, unlike a
    * wide pivot + global-ordered window. The per-series lag columns
    * (calendar-sized, driver-bounded) broadcast-join back onto every row. */
  def addCrossSeriesLags(df: DataFrame, seriesIds: Seq[String], maxLag: Int): DataFrame = {
    val spine = df.select(col(Ds)).distinct()
    val dense = spine
      .withColumn(SeriesId, explode(lit(seriesIds.toArray)))
      .join(df.select(col(SeriesId), col(Ds), col(Y)), Seq(SeriesId, Ds), "left")
    val lagged = dense.select(
      (Seq(col(SeriesId), col(Ds)) ++
        (1 to maxLag).map(k => lag(col(Y), k).over(w).as(s"_xl$k"))): _*)
    seriesIds.foldLeft(df) { (f, sid) =>
      val cols = col(Ds) +: (1 to maxLag).map(k => col(s"_xl$k").as(xlagCol(sid, k)))
      f.join(broadcast(lagged.filter(col(SeriesId) === sid).select(cols: _*)),
        Seq(Ds), "left")
    }
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
