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
    * (/root/reference/src/scalecast/models.py:124-140): test rows are
    * predicted recursively in chunks of `k` steps, and at every chunk
    * boundary the AR state re-seeds from actual values. `k = 1` is the
    * fully-peeked one-step case; `k ≥ testLength` degenerates to the
    * all-dynamic recursion.
    *
    * Spark-first shape: all chunks advance in lockstep — iteration j fills
    * step j of EVERY chunk of every series in one whole-frame op, so the loop
    * runs `k` times total regardless of test length or series count (the
    * reference's speed/accuracy knob, made cheaper: cost is O(k) jobs, not
    * O(testLength)). AR cells prefer the own-chunk prediction ledger and fall
    * back to actuals, which is exactly the chunk-reset semantics.
    */
  def dynamicTestForecast(frame: DataFrame, model: Transformer, k: Int): DataFrame = {
    require(k >= 1, s"peek cadence must be >= 1, got $k")
    val arLags = FeatureOps.arCols(frame).map(c => c.stripPrefix(FeatureOps.ArPrefix).toInt)
    val withT = frame.withColumn("_t", row_number().over(w)).localCheckpoint(true)
    val isTestRow = col("is_test") && !col(IsFuture)
    val test = withT.filter(isTestRow)
      .withColumn("_s", row_number().over(w))
      .withColumn("_chunk", floor((col("_s") - 1) / k))
      .withColumn("_j", (col("_s") - 1) % k + 1)
      .localCheckpoint(true)
    // non-test rows score vectorized (train rows see actual AR cells)
    val fittedRest = model.transform(withT.filter(!isTestRow))
    // one actuals map per series (computed once) + one per-chunk prediction
    // map per iteration: filling all k AR lags is 2 joins + map lookups per
    // iteration, independent of the lag count.
    val actualsMap = withT.filter(!col(IsFuture))
      .groupBy(SeriesId)
      .agg(map_from_entries(collect_list(struct(col("_t"), col(Y)))).as("_am"))
      .localCheckpoint(true)
    var predParts = List.empty[DataFrame]
    var preds = List.empty[DataFrame]
    for (j <- 1 to k) {
      var rows = test.filter(col("_j") === j).join(actualsMap, Seq(SeriesId), "left")
      if (predParts.nonEmpty) {
        val predMap = predParts.reduce(_ unionByName _)
          .groupBy(SeriesId, "_chunk")
          .agg(map_from_entries(collect_list(struct(col("_t"), col("_vp")))).as("_pm"))
        rows = rows.join(predMap, Seq(SeriesId, "_chunk"), "left")
      } else rows = rows.withColumn("_pm", lit(null).cast("map<int,double>"))
      for (l <- arLags) {
        val ar = s"${FeatureOps.ArPrefix}$l"
        rows = rows.drop(ar).withColumn(ar,
          coalesce(element_at(col("_pm"), col("_t") - l),
            element_at(col("_am"), col("_t") - l)))
      }
      val scored = model.transform(rows.drop("_am", "_pm")).localCheckpoint(true)
      predParts ::= scored.select(col(SeriesId), col("_t"), col("_chunk"),
        col("yhat").as("_vp"))
      preds ::= scored
    }
    val out = preds.foldLeft(fittedRest)((acc, p) =>
      acc.unionByName(p.select(fittedRest.columns.map(col).toSeq: _*)))
    out.drop("_t", "_s", "_chunk", "_j", "_fraw", "_f")
  }
}
