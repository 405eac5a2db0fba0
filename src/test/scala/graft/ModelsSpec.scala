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

  test("trendSeasonal fits train only and predicts horizon") {
    val ys = (0 until 36).map(t => 50.0 + 2 * t + (if (t % 12 == 0) 10 else 0))
    val base = SeriesFrame.withTestFlag(
      SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6), 6)
    val out = Baselines.trendSeasonal(base)
    assert(out.filter(col("is_future") && col("yhat").isNull).count() === 0)
  }
}
