package graft

import org.apache.spark.sql.functions._

/** The README quickstarts, compiled and executed verbatim — the doc-test
  * that keeps the migration examples honest: if a facade method in the
  * README drifts from the code, this spec stops compiling. */
class QuickstartSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("README Forecaster quickstart runs end to end") {
    import spark.implicits._
    val series = (0 until 48).map { t =>
      ("s1", java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusMonths(t)),
        Some(100.0 + 2.0 * t + 10 * math.sin(t * 2 * math.Pi / 12)), false)
    }.toDF("series_id", "ds", "y", "is_future")

    // --- README "Quickstart (the scalecast call sequence, distributed)" ---
    val f = Forecaster(series)                 // long (series_id, ds, y, is_future)
      .generateFutureDates(12)                 // infer freq, spine horizon
      .setTestLength(12)                       // temporal holdout
      .addArTerms(3).addTimeTrend()
      .setEstimator("mlr")
      .manualForecast(callMe = "mlr_ar3")      // fit + dynamic predict + bank
      .setEstimator("hwes", Map("alpha" -> 0.3, "beta" -> 0.1,
                                "gamma" -> 0.2, "m" -> 12.0))
      .manualForecast(callMe = "hw")
      .setComboModels("mlr_ar3", "hw").setEstimator("combo")
      .manualForecast(callMe = "avg")
    val summaries = f.exportModelSummaries()   // per (model, series) metrics
    val forecasts = f.exportForecasts()        // horizon pivot, one col per model
    // --- end snippet ---

    assert(summaries.filter(col("model").isin("mlr_ar3", "hw", "avg")).count() > 0)
    assert(forecasts.count() === 12)
    assert(forecasts.columns.toSet === Set("series_id", "ds", "mlr_ar3", "hw", "avg"))
  }

  test("README Corpus curation chain runs end to end") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val benchmarkDocs = docs.filter(col("doc_id") % 11 === 3)

    // --- README curation-tier snippet ---
    val packed = Corpus(docs)                  // (doc_id, text [, source, lang…])
      .qualityFilter(0.7).gopherFilter()       // heuristics + Gopher gates
      .perplexityFilter(20, 2000)              // corpus-trained bigram LM
      .dedupExact()
      .dedupNearClusters(0.8)                  // pair graph → CC, keep one per cluster
      .stripDupSpans(8)                        // cut repeated ≥8-token runs, keep first
      .decontaminate(benchmarkDocs)            // n-gram overlap anti-join
      .piiRedact()
      .sampleTemperature("source", alpha = 0.7, targetTotal = 100000L)
      .pack(2048)                              // concat-and-chunk sequences
    // --- end snippet ---

    assert(packed.columns.contains("text"))
    assert(packed.count() > 0, "the curated corpus must pack at least one chunk")
  }

  test("README Events quickstart runs end to end") {
    val ev = Events(graft.core.Tables.events(spark, sfDir))

    // --- README behavioral-tier snippet ---
    val sessions = ev.sessionize(gapMs = 1800000)
    val funnel = ev.funnel(Seq("view", "cart", "purchase"),
      windowNs = 86400000000000L)
    val top = ev.topUsers(10)                  // top-k PER HOUR (bounded sketch)
    val kmv = ev.distinctUsersByHour(1024)
    val paths = ev.topPaths(n = 3, k = 10)
    // --- end snippet ---

    assert(sessions.count() > 0 && funnel.count() > 0)
    val perHour = top.groupBy("hour_ms").count()
      .agg(max("count")).first().getLong(0)
    assert(perHour <= 10 && top.count() > 0, "top-k is bounded per hour")
    assert(kmv.count() > 0 && paths.count() > 0)
  }
}
