package graft

import graft.core.SeriesFrame
import graft.functions.FeatureOps
import graft.models.{Baselines, MllibTsEstimator, Recursive, Smoothing}
import org.apache.spark.sql.functions._

class ModelsSpec extends SparkSpec {

  test("naive forecast tiles the last value (models.py:1473-1476, m=1)") {
    val df = SeriesFrame.withMonthlyHorizon(obsSeries(Seq(5.0, 6, 7, 8, 9)), 5)
    val out = Baselines.naiveForecast(df, 1)
    val fc = col1(out.filter(col("is_future")), "yhat")
    assert(fc === Seq(9.0, 9, 9, 9, 9))
  }

  test("seasonal naive tiles the last cycle (m=3)") {
    val df = SeriesFrame.withMonthlyHorizon(obsSeries(Seq(1.0, 2, 3, 7, 8, 9)), 5)
    val out = Baselines.naiveForecast(df, 3)
    val fc = col1(out.filter(col("is_future")), "yhat")
    assert(fc === Seq(7.0, 8, 9, 7, 8))
  }

  test("combo simple average of two constant forecasts is the midpoint") {
    val df = obsSeries(Seq(1.0, 2, 3))
      .withColumn("m1", lit(10.0)).withColumn("m2", lit(20.0))
    val out = Baselines.comboAvg(df, Seq("m1", "m2"))
    assert(col1(out, "yhat_combo").forall(_ == 15.0))
  }

  test("weighted combo") {
    val df = obsSeries(Seq(1.0)).withColumn("m1", lit(10.0)).withColumn("m2", lit(20.0))
    val out = Baselines.comboWeighted(df, Seq("m1" -> 3.0, "m2" -> 1.0))
    assert(col1(out, "yhat_combo") === Seq(12.5))
  }

  test("metric-weighted combo hands the best model the largest weight") {
    val spark2 = spark; import spark2.implicits._
    // models ordered worst→best by rmse (10.0 vs 2.0, lower is better)
    val df = Seq((1.0, 100.0, 0.0)).toDF("y", "f_bad", "f_good")
    val out = Baselines.comboMetricWeighted(df, Seq("f_bad", "f_good"),
      scores = Seq(10.0, 2.0), lowerIsBetter = true)
    // reversed weights: f_bad gets 2/12, f_good gets 10/12 → 100·(2/12)
    val v = out.select("yhat_combo").first().getDouble(0)
    assert(math.abs(v - 100.0 * 2.0 / 12.0) < 1e-9, s"combo=$v")
  }

  test("SES recursion: hand-computed case") {
    // alpha=0.5, y=[10,12,14]: l1=10; yhat2=10; l2=11; yhat3=11; l3=12.5
    val df = SeriesFrame.withMonthlyHorizon(obsSeries(Seq(10.0, 12, 14)), 2)
    val out = Smoothing.ses(df, 0.5)
    val fitted = col1(out.filter(!col("is_future")), "yhat")
    assert(fitted(0).isNaN)
    assert(fitted(1) === 10.0 && fitted(2) === 11.0)
    val fc = col1(out.filter(col("is_future")), "yhat")
    assert(fc === Seq(12.5, 12.5))
  }

  test("Holt-Winters additive: recursion matches a hand-rolled reference") {
    val ys = (0 until 24).map(t => 10.0 + t + 5 * math.sin(2 * math.Pi * t / 4))
    val df = SeriesFrame.withMonthlyHorizon(obsSeries(ys), 4)
    val out = Smoothing.holtWinters(df, 0.3, 0.1, 0.2, 4)
    // independent scala re-implementation
    val m = 4
    val c1 = ys.slice(0, m); val c2 = ys.slice(m, 2 * m)
    var level = c1.sum / m; var trend = (c2.sum / m - c1.sum / m) / m
    val seas = Array.tabulate(m)(i => c1(i) - c1.sum / m)
    val expFitted = ys.zipWithIndex.map { case (yv, t) =>
      val si = t % m
      val f = level + trend + seas(si)
      val nl = 0.3 * (yv - seas(si)) + 0.7 * (level + trend)
      trend = 0.1 * (nl - level) + 0.9 * trend
      seas(si) = 0.2 * (yv - nl) + 0.8 * seas(si)
      level = nl
      f
    }
    val fitted = col1(out.filter(!col("is_future")), "yhat")
    expFitted.zip(fitted).foreach { case (e, g) => assert(math.abs(e - g) < 1e-9) }
    val fc = col1(out.filter(col("is_future")), "yhat")
    val expFc = (1 to 4).map(k => level + k * trend + seas((24 + k - 1) % m))
    expFc.zip(fc).foreach { case (e, g) => assert(math.abs(e - g) < 1e-9) }
  }

  test("MLlib OLS on AR(1) + recursive forecast recovers an exact AR process") {
    // y_t = 2 + 0.5 y_{t-1}, y_0 = 10 — exactly linear in its lag, so OLS
    // recovers (a, b) and the dynamic forecast continues the recursion.
    val ys = Iterator.iterate(10.0)(v => 2 + 0.5 * v).take(30).toSeq
    val base = SeriesFrame.withMonthlyHorizon(obsSeries(ys), 5)
    val withAr = FeatureOps.addArTerms(base, 1)
    val model = MllibTsEstimator("mlr", Seq("ar_1")).fit(withAr)
    val out = Recursive.dynamicForecast(withAr, model)
    val fc = col1(out.filter(col("is_future")), "yhat")
    val exp = Iterator.iterate(ys.last)(v => 2 + 0.5 * v).drop(1).take(5).toSeq
    exp.zip(fc).foreach { case (e, g) => assert(math.abs(e - g) < 1e-6, s"$e vs $g") }
  }

  test("knn predicts the mean y of the k nearest train rows") {
    import graft.models.KnnRegressor
    // y = step function of x: neighbors of x=2.1 are x∈{2,3,1} → mean of their y
    val spark2 = spark; import spark2.implicits._
    val train = Seq(("s", 1.0, 10.0), ("s", 2.0, 20.0), ("s", 3.0, 30.0),
        ("s", 10.0, 100.0), ("s", 11.0, 110.0))
      .toDF("series_id", "x", "y")
      .withColumn("is_future", lit(false))
    val model = KnnRegressor.fit(train, Seq("x"), k = 3)
    val scored = model.transform(Seq(("s", 2.1), ("s", 10.5)).toDF("series_id", "x"))
      .orderBy("x").collect().map(_.getAs[Double]("yhat"))
    assert(math.abs(scored(0) - 20.0) < 1e-9) // (10+20+30)/3
    assert(math.abs(scored(1) - 80.0) < 1e-9) // (30+100+110)/3
  }

  test("sgd and rf estimators fit and dynamically forecast (registry parity)") {
    val ys = (1 to 60).map(i => 10.0 + 0.5 * i + 3 * math.sin(i / 4.0))
    val frame = FeatureOps.addArTerms(
      SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6), 3)
    for (algo <- Seq("sgd", "rf")) {
      val model = MllibTsEstimator(algo, Seq("ar_1", "ar_2", "ar_3"),
        Map("n_estimators" -> 20.0, "max_depth" -> 4.0)).fit(frame)
      val fc = col1(Recursive.dynamicForecast(frame, model)
        .filter(col("is_future")), "yhat")
      assert(fc.size == 6 && fc.forall(v => !v.isNaN), s"$algo horizon complete")
      // predictions stay in the series' neighborhood
      assert(fc.forall(v => v > 10 && v < 60), s"$algo forecast sane: $fc")
    }
  }

  test("svr/mlp route outside the pipeline builder; prophet_like fits the curve vectorized") {
    for (algo <- Seq("svr", "mlp")) {
      // fit() serves them natively (SvrMlpSpec); the MLlib pipeline builder
      // has no stage for them and must say so, not silently substitute
      val e = intercept[UnsupportedOperationException] {
        MllibTsEstimator(algo, Seq("ar_1")).pipeline()
      }
      assert(e.getMessage.contains("Svr/MlpNet"), s"$algo message: ${e.getMessage}")
    }
    // prophet_like: exact recovery of a trend + sinusoid at period 12
    val ys = (0 until 48).map(t => 10.0 + 0.5 * (t + 1) +
      3 * math.sin(2 * math.Pi * (t + 1) / 12.0))
    val out = graft.models.ProphetLike.forecast(
      SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6))
    val fut = col1(out.filter(col("is_future")), "yhat")
    val expect = (48 until 54).map(t => 10.0 + 0.5 * (t + 1) +
      3 * math.sin(2 * math.Pi * (t + 1) / 12.0))
    fut.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-6, s"prophet_like horizon: $g vs $e") }
  }

  test("prophet_like changepoint trend recovers a planted break exactly") {
    // 60 training rows, 4 changepoints → integer-quantile knots
    // (8·60·j)//50 = 9, 19, 28, 38 (ProphetLike.changepoints); plant the
    // slope break AT knot 19 so the hinge basis can represent the curve
    // exactly and OLS must recover it — horizon included
    assert(graft.models.ProphetLike.changepoints(60, 4) === Seq(9L, 19L, 28L, 38L))
    def curve(t: Int): Double = 10.0 + 0.5 * t + 2.0 * math.max(0, t - 19) +
      3 * math.sin(2 * math.Pi * t / 12.0)
    val ys = (1 to 60).map(curve)
    val out = graft.models.ProphetLike.forecast(
      SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6), nChangepoints = 4)
    val fut = col1(out.filter(col("is_future")), "yhat")
    val expect = (61 to 66).map(curve)
    fut.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-6, s"prophet_cp horizon: $g vs $e") }
    // without changepoints the single-trend fit CANNOT follow the break
    val flat = graft.models.ProphetLike.forecast(
      SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6))
    val flatErr = col1(flat.filter(col("is_future")), "yhat")
      .zip(expect).map { case (g, e) => math.abs(g - e) }.max
    assert(flatErr > 1.0, s"single-trend fit should miss the break: $flatErr")
    // knot clipping: degenerate short series collapse rather than error
    assert(graft.models.ProphetLike.changepoints(3, 5).forall(c => c >= 1 && c < 3))
  }

  test("facade routes prophet_like natively with n_changepoints") {
    def curve(t: Int): Double = 5.0 + 0.3 * t + 1.5 * math.max(0, t - 19)
    val ys = (1 to 60).map(curve)
    val f = Forecaster(obsSeries(ys))
      .generateFutureDates(6)
      .setEstimator("prophet_like", Map("n_changepoints" -> 4.0, "fourier_order" -> 1.0))
      .manualForecast(callMe = "pcp")
    val fc = col1(f.exportForecasts().orderBy("ds"), "pcp")
    assert(fc.length == 6 && fc.forall(v => !v.isNaN))
    val expect = (61 to 66).map(curve)
    fc.toSeq.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-5, s"facade prophet_cp: $g vs $e") }
  }

  test("tbats_like ARMA error correction models autocorrelated residuals") {
    // log-scale curve + a deterministic AR(1)-ish residual wave the
    // trend+Fourier basis cannot express (period 5 ≠ the m=12 harmonics):
    // the ARMA channel must capture part of it → strictly lower in-sample
    // SSE than the curve-only fit, and a complete horizon
    val ys = (1 to 72).map { t =>
      math.exp(3.0 + 0.02 * t + 0.3 * math.sin(2 * math.Pi * t / 12.0)
        + 0.1 * math.sin(2 * math.Pi * t / 5.0))
    }
    val frame = SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6)
    def sse(df: org.apache.spark.sql.DataFrame): Double =
      df.filter(!col("is_future") && col("yhat").isNotNull)
        .agg(sum(pow(col("y") - col("yhat"), 2))).first().getDouble(0)
    val plain = graft.models.TbatsLike.forecast(frame)
    val arma = graft.models.TbatsLike.forecastArma(frame)
    val fut = col1(arma.filter(col("is_future")), "yhat")
    assert(fut.size == 6 && fut.forall(v => !v.isNaN && v > 0))
    assert(sse(arma) < sse(plain),
      s"ARMA correction should cut in-sample SSE: ${sse(arma)} vs ${sse(plain)}")
    // facade routing: arma_p/arma_q switch the correction on
    val f = Forecaster(obsSeries(ys)).generateFutureDates(6)
      .setEstimator("tbats_like", Map("arma_p" -> 1.0, "arma_q" -> 1.0))
      .manualForecast(callMe = "tba")
    assert(col1(f.exportForecasts().orderBy("ds"), "tba").forall(v => !v.isNaN))
  }

  test("tbats_like: multi-period trig seasonality on the Box-Cox scale, exact recovery") {
    // y = exp(linear trend + two incommensurate sinusoids): λ MLE → ~0 (log),
    // and on the log scale the OLS recovers the curve exactly — horizon too
    def f(t: Int): Double = math.exp(2.0 + 0.01 * (t + 1) +
      0.3 * math.sin(2 * math.Pi * (t + 1) / 12.0) +
      0.2 * math.sin(2 * math.Pi * (t + 1) / 5.0))
    val ys = (0 until 60).map(f)
    val out = graft.models.TbatsLike.forecast(
      SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6), periods = Seq(12.0, 5.0))
    val fut = col1(out.filter(col("is_future")), "yhat")
    (60 until 66).zip(fut).foreach { case (t, g) =>
      assert(math.abs(g - f(t)) / f(t) < 1e-3, s"horizon t=$t: $g vs ${f(t)}") }
    // single-period fit must be visibly worse on the same series (the
    // multi-seasonality is what tbats_like buys)
    val one = graft.models.TbatsLike.forecast(
      SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6), periods = Seq(12.0))
    val err1 = col1(one.filter(col("is_future")), "yhat")
      .zip((60 until 66).map(f)).map { case (g, e) => math.abs(g - e) / e }.max
    assert(err1 > 1e-2, s"single-period fit should miss the 5-cycle: $err1")
    // registry points tbats/prophet/rnn names at their substitutions/scopes
    val e = intercept[UnsupportedOperationException] {
      MllibTsEstimator("tbats", Seq("ar_1")).pipeline()
    }
    assert(e.getMessage.contains("tbats_like"))
    // facade registration with m/m2 params
    val banked = Forecaster(obsSeries(ys)).generateFutureDates(6)
      .setEstimator("tbats_like", Map("m" -> 12.0, "m2" -> 5.0))
      .manualForecast(callMe = "tb")
    assert(banked.results.get.filter(col("is_future") && col("yhat").isNull).count() == 0)
  }

  test("trendSeasonal fits train only and predicts horizon") {
    val ys = (0 until 36).map(t => 50.0 + 2 * t + (if (t % 12 == 0) 10 else 0))
    val base = SeriesFrame.withTestFlag(
      SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6), 6)
    val out = Baselines.trendSeasonal(base)
    assert(out.filter(col("is_future") && col("yhat").isNull).count() === 0)
  }
}
