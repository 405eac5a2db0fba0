package graft

import org.apache.spark.sql.functions._

/** The reference-shaped workflow end to end through the [[Forecaster]]
  * facade: spine → holdout → regressors → estimator → forecast → exports. */
class ForecasterFacadeSpec extends SparkSpec {

  private def ys = (0 until 60).map(t =>
    100.0 + 2 * t + 10 * math.sin(2 * math.Pi * t / 12.0) + ((t * 13) % 7))

  test("interval dummies, history ops, and the default grid flow through the facade") {
    val f = Forecaster(obsSeries(ys)) // fixture starts 2020-01 → covid window overlaps
      .addCovid19Regressor()
      .addOtherRegressor("2020-08-01", "2020-10-01", "promo")
      .addTimeTrend().addComboRegressors("t", "promo")
    assert(f.frame.columns.contains("COVID19") && f.frame.columns.contains("t_promo"))
    // the covid window overlaps this 60-month span → dummy actually fires
    assert(f.frame.filter(col("COVID19") === 1.0).count() > 0)
    val chopped = f.chopFromFront(6).keepSmallerHistory(24)
    assert(chopped.frame.count() == 24)
    // ingest_grid default: the shipped grid for the current estimator
    val g = f.setEstimator("gbt").defaultGrid
    assert(g.nonEmpty && g.head.contains("max_depth"))
  }

  test("manualForecast banks mlr + hwes + combo; exports read coherently") {
    val f = Forecaster(obsSeries(ys))
      .generateFutureDates(6)
      .setTestLength(12)
      .setCilevel(0.9) // conformal needs testLength >= 1/(1-cilevel) = 10
      .addArTerms(2).addTimeTrend()
      .setEstimator("mlr")
      .manualForecast(callMe = "mlr_ar2")
      .setEstimator("hwes", Map("alpha" -> 0.3, "beta" -> 0.1, "gamma" -> 0.2, "m" -> 12.0))
      .manualForecast(callMe = "hw")
      .setComboModels("mlr_ar2", "hw")
      .setEstimator("combo")
      .manualForecast(callMe = "avg")

    assert(f.modelNames == Seq("avg", "hw", "mlr_ar2"))
    val fc = f.exportForecasts()
    assert(fc.count() == 6)
    assert(fc.filter(col("mlr_ar2").isNull || col("hw").isNull || col("avg").isNull).count() == 0)
    // combo really is the average of the two banked horizons
    val bad = fc.filter(abs((col("mlr_ar2") + col("hw")) / 2 - col("avg")) > 1e-9)
    assert(bad.count() == 0, bad.collect().mkString("; "))

    val sm = f.exportModelSummaries()
    assert(sm.count() == 3 && sm.filter(col("test_rmse").isNull).count() == 0)
    // conformal CIs exist on the horizon (testLength 12 >= minTestLength(0.9))
    assert(f.results.get.filter(col("is_future") && col("model") === "mlr_ar2" &&
      (col("lower").isNull || col("upper").isNull)).count() == 0)
    // ranking runs and puts SOME model first
    assert(f.orderModels().first().getString(0).nonEmpty)
    // test-set predictions pivot covers the holdout
    assert(f.exportTestSetPredictions().count() == 12)
    assert(f.pop("hw").modelNames == Seq("avg", "mlr_ar2"))
  }

  test("tune picks the better hyperparameter by rolling CV; autoForecast banks it") {
    val f = Forecaster(obsSeries(ys))
      .generateFutureDates(4).setTestLength(8)
      .addArTerms(1).addTimeTrend()
      .setEstimator("ridge")
      .autoForecast(Seq(Map("alpha" -> 0.001), Map("alpha" -> 10000.0)),
        callMe = "ridge_tuned", k = 2, h = 8)
    assert(f.params("alpha") == 0.001, s"huge shrinkage must lose: ${f.params}")
    assert(f.modelNames == Seq("ridge_tuned"))
    assert(f.results.get.filter(col("is_future") && col("yhat").isNull).count() == 0)
  }

  test("crossValidate and backtest are chainable on the facade (reference's f.cross_validate(k=3))") {
    val f = Forecaster(obsSeries(ys)).addArTerms(1).setEstimator("mlr")
    val cv = f.crossValidate(k = 3, h = 6)
    assert(cv.count() == 3, "one row per (series, fold)")
    assert(cv.filter(col("rmse").isNull || col("mae").isNull).count() == 0)
    val bt = f.backtest(nIter = 2, h = 6, jumpBack = 6)
    assert(bt.count() == 2)
    val pivoted = graft.eval.Evaluation.backtestMetrics(bt, Seq("rmse", "mae"), 2)
    assert(pivoted.count() == 2 && pivoted.columns.contains("average"))
    // the reference sequence: cross_validate THEN auto_forecast still banks
    val banked = f.generateFutureDates(4).setTestLength(8)
      .autoForecast(Seq(Map.empty[String, Double]), callMe = "mlr_cv", k = 2, h = 8)
    assert(banked.modelNames == Seq("mlr_cv"))
  }

  test("autoXvarSelect + reduceXvars chain and record a replayable spec list") {
    val f = Forecaster(obsSeries(ys)).autoXvarSelect(maxAr = 3, h = 12)
    // scaffolding (raw month) and losing candidates are gone; winners remain
    assert(!f.frame.columns.contains("month"))
    assert(f.frame.columns.contains("t"), "trend must survive on a trending series")
    assert(f.specs.nonEmpty)
    // replaying the recorded chain on a fresh Forecaster reproduces columns
    val replayed = Forecaster(obsSeries(ys, sid = "b")).applySpecs(f.specs)
    assert(replayed.frame.columns.sorted.toSeq == f.frame.columns.sorted.toSeq)
    val reduced = f.reduceXvars(h = 12)
    assert(reduced.frame.columns.length <= f.frame.columns.length)
  }

  test("specs replay on another series gives identical feature columns; PipelineStore round-trips them") {
    val a = Forecaster(obsSeries(ys))
      .addArTerms(2).addTimeTrend()
      .addSeasonalRegressors("month").addFourier("month", 12.0, "month")
      .dropRegressors("month")
      .addPolyTerms(2, "t")
    val b = Forecaster(obsSeries(ys.map(_ * 2.0), sid = "b")).applySpecs(a.specs)
    assert(b.frame.columns.toSeq == a.frame.columns.toSeq)
    // persisted spec list round-trips through PipelineStore and re-applies
    val path = java.nio.file.Files.createTempDirectory("graft-specs").toString
    graft.results.PipelineStore.save(path, graft.operators.TransformStack(Nil), spark,
      featureSpecs = a.specs)
    val loaded = graft.results.PipelineStore.loadFeatureSpecs(spark, path)
    assert(loaded == a.specs)
    val c = Forecaster(obsSeries(ys, sid = "c")).applySpecs(loaded)
    assert(c.frame.columns.toSeq == a.frame.columns.toSeq)
  }

  test("arima defaultGrid excludes (0,0) and a failing cell can't abort the tune") {
    val f = Forecaster(obsSeries(ys)).setEstimator("arima")
    val g = f.defaultGrid
    assert(!g.exists(m => m("p") == 0.0 && m("q") == 0.0), "ARMA(0,0) must be excluded")
    // a deliberately broken extra cell (negative order) scores NaN and loses
    val tuned = f.tune(g.take(2) :+ Map("p" -> -5.0, "q" -> -5.0), k = 2, h = 6)
    assert(tuned.params("p") >= 0.0)
  }

  test("tuneFull carries the normalizer axis of the mlr default grid") {
    val f = Forecaster(obsSeries(ys)).addArTerms(1).setEstimator("mlr")
    assert(f.defaultGridFull.map(_._2).distinct.sorted == Seq("minmax", "none", "scale"))
    val tuned = f.tuneFull(f.defaultGridFull, k = 2, h = 6)
    assert(Seq("scale", "minmax", "none").contains(tuned.normalizer))
  }

  test("peeking cadence + naive family through the facade") {
    val f = Forecaster(obsSeries(ys))
      .generateFutureDates(4)
      .setTestLength(8)
      .setDynamicTesting(2)
      .addArTerms(1)
      .setEstimator("mlr")
      .manualForecast(callMe = "mlr_peek2")
      .dropRegressors("ar_1")
      .setEstimator("snaive", Map("m" -> 12.0))
      .manualForecast(callMe = "snaive")
    val sm = f.exportModelSummaries(Seq("rmse"))
    assert(sm.count() == 2)
    val fut = f.results.get.filter(col("is_future") && col("yhat").isNull).count()
    assert(fut == 0, "both horizons complete")
  }
}
