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
    // so trim the ledger up front — keeps the per-step state bounded at
    // series × (lags + h) rows no matter how long the history is.
    // Per step the ledger collapses to ONE tiny map column per series
    // (t → value), so filling ALL k AR lags is a single join + k map lookups
    // instead of k joins — one job per horizon step total. Ledger pieces are
    // each checkpointed, so the running union stays a shallow plan without
    // re-checkpointing.
    val maxLag = if (arLags.isEmpty) 0 else arLags.max
    val keep = maxLag + maxStep
    val lastT = obs.groupBy(SeriesId).agg(max("_t").as("_maxT"))
    var knownParts = List(obs.join(lastT, Seq(SeriesId))
      .filter(col("_t") > col("_maxT") - keep)
      .select(col(SeriesId), col("_t"), col(Y).as("_v"))
      .localCheckpoint(true))
    var preds = List.empty[DataFrame]
    for (i <- 1 to maxStep) {
      val ledgerMap = knownParts.reduce(_ unionByName _)
        .groupBy(SeriesId)
        .agg(map_from_entries(collect_list(struct(col("_t"), col("_v")))).as("_lm"))
      var rows = fut.filter(col("_step") === i).join(ledgerMap, Seq(SeriesId), "left")
      for (k <- arLags)
        rows = rows.drop(s"${FeatureOps.ArPrefix}$k")
          .withColumn(s"${FeatureOps.ArPrefix}$k", element_at(col("_lm"), col("_t") - k))
      val scored = model.transform(rows.drop("_lm")).localCheckpoint(true)
      knownParts ::= scored.select(col(SeriesId), col("_t"), col("yhat").as("_v"))
      preds ::= scored
    }
    val out = preds.foldLeft(fitted)((acc, p) =>
      acc.unionByName(p.select(fitted.columns.map(col).toSeq: _*)))
    out.drop("_t", "_step", "_fraw", "_f")
  }

  /** Test-set prediction with peeking cadence `dynamic_testing = k`
    * (/root/reference/src/scalecast/models.py:109-149): the reference walks
    * the test slice sequentially, appending each PREDICTION to its value
    * ledger except at peek positions s where s % k == 0, which re-seed with
    * the ACTUAL (`series.append(peeks[i]) only when (i+1) % k == 0`). So an
    * AR cell referencing an earlier test position reads the prediction made
    * there unless that position was a peek. `k = 1` peeks everywhere (fully
    * vectorized one-step); `k ≥ testLength` never peeks (the all-dynamic
    * recursion).
    *
    * Spark-first shape: wavefront scheduling over the exact dependency DAG.
    * Position s depends on position s−l for each AR lag l unless the
    * dependency is cut (s−l precedes the test slice → train actual, or
    * s−l is a peek). Dependency LEVELS are series-independent driver int
    * math (an O(testLength·lags) array); iteration v scores every position
    * of level v of EVERY series/chunk in one whole-frame op. For AR(1) this
    * degenerates to exactly k iterations (the chunk-lockstep shape); for
    * deeper lags it runs just as many iterations as the reference's data
    * dependencies force — never one per test row when peeks cut the chains.
    */
  def dynamicTestForecast(frame: DataFrame, model: Transformer, k: Int): DataFrame = {
    require(k >= 1, s"peek cadence must be >= 1, got $k")
    val arLags = FeatureOps.arCols(frame).map(c => c.stripPrefix(FeatureOps.ArPrefix).toInt)
    val withT = frame.withColumn("_t", row_number().over(w)).localCheckpoint(true)
    val isTestRow = col("is_test") && !col(IsFuture)
    val test0 = withT.filter(isTestRow)
      .withColumn("_s", row_number().over(w))
      .localCheckpoint(true)
    val maxS = {
      val r = test0.agg(max("_s")).first()
      if (r.isNullAt(0)) 0 else r.getInt(0)
    }
    // dependency level of test position s (1-based): 1 + max level over
    // uncut AR dependencies. Positions are aligned across series (the test
    // slice is the last testLength rows of each), so ONE integer array
    // covers every series — no per-series state.
    val level = Array.ofDim[Int](maxS + 1)
    for (s <- 1 to maxS) {
      val deps = arLags.filter(l => s - l >= 1 && (s - l) % k != 0).map(l => level(s - l))
      level(s) = if (deps.isEmpty) 1 else deps.max + 1
    }
    val maxLevel = if (maxS == 0) 0 else (1 to maxS).map(level).max
    val test =
      if (maxS == 0) test0.withColumn("_lvl", lit(1))
      else test0.withColumn("_lvl",
        element_at(array((1 to maxS).map(s => lit(level(s))): _*), col("_s")))
    // non-test rows score vectorized (train rows see actual AR cells)
    val fittedRest = model.transform(withT.filter(!isTestRow))
    // the ledger's actual values: everything before the test slice + the
    // peek positions. Predictions everywhere else — actuals win at peeks.
    val peekT = test0.filter(col("_s") % k === 0)
      .select(col(SeriesId), col("_t"), col(Y).as("_v"))
    val knownMap = withT.filter(!col(IsFuture) && !col("is_test"))
      .select(col(SeriesId), col("_t"), col(Y).as("_v"))
      .unionByName(peekT)
      .groupBy(SeriesId)
      .agg(map_from_entries(collect_list(struct(col("_t"), col("_v")))).as("_am"))
      .localCheckpoint(true)
    var predParts = List.empty[DataFrame]
    var preds = List.empty[DataFrame]
    for (v <- 1 to maxLevel) {
      var rows = test.filter(col("_lvl") === v).join(knownMap, Seq(SeriesId), "left")
      if (predParts.nonEmpty) {
        val predMap = predParts.reduce(_ unionByName _)
          .groupBy(SeriesId)
          .agg(map_from_entries(collect_list(struct(col("_t"), col("_vp")))).as("_pm"))
        rows = rows.join(predMap, Seq(SeriesId), "left")
      } else rows = rows.withColumn("_pm", lit(null).cast("map<int,double>"))
      for (l <- arLags) {
        val ar = s"${FeatureOps.ArPrefix}$l"
        rows = rows.drop(ar).withColumn(ar,
          coalesce(element_at(col("_am"), col("_t") - l),
            element_at(col("_pm"), col("_t") - l)))
      }
      val scored = model.transform(rows.drop("_am", "_pm")).localCheckpoint(true)
      predParts ::= scored.select(col(SeriesId), col("_t"), col("yhat").as("_vp"))
      preds ::= scored
    }
    val out = preds.foldLeft(fittedRest)((acc, p) =>
      acc.unionByName(p.select(fittedRest.columns.map(col).toSeq: _*)))
    out.drop("_t", "_s", "_lvl", "_fraw", "_f")
  }
}
