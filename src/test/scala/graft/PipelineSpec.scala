package graft

import graft.core.SeriesFrame
import graft.eval.TsPipeline
import graft.models.{Baselines, MllibTsEstimator}
import graft.operators.{Conformal, Transforms}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  val ys: Seq[Double] = (0 until 48).map(t =>
    math.exp(4.0 + 0.02 * t + 0.1 * math.sin(2 * math.Pi * (t % 12) / 12.0)))

  test("pipeline fit_predict reverts predictions to original units") {
    val base = SeriesFrame.withTestFlag(
      SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6), 6)
    val out = TsPipeline.fitPredict(base,
      Seq(df => Transforms.logT(df)),
      df => Baselines.trendSeasonal(df))
    // y must round-trip exactly
    val yBack = col1(out.filter(!col("is_future")), "y")
    ys.zip(yBack).foreach { case (a, b) => assert(math.abs(a - b) < 1e-8) }
    // exp(linear trend in log space) ⇒ forecasts positive and level-scaled
    val fc = col1(out.filter(col("is_future")), "yhat")
    assert(fc.forall(v => v > 0 && v < 1000))
  }

  test("pipeline backtest returns n_iter scored frames in original units") {
    val frames = TsPipeline.backtest(obsSeries(ys), 2, 6, 3,
      Seq(df => Transforms.logT(df)),
      df => Baselines.naiveFitted(df, 1))
    assert(frames.size === 2)
    frames.foreach { f =>
      val tested = f.filter(col("is_test") && col("yhat").isNotNull)
      assert(tested.count() === 6)
      // reverted: predictions are in level units (same magnitude as y)
      val r = tested.agg(avg(abs(col("y") - col("yhat")))).first().getDouble(0)
      assert(r < 50.0)
    }
  }

  test("dynamic intervals widen with horizon step on a drifting model") {
    val base = obsSeries(ys)
    val scored = TsPipeline.backtest(base, 3, 6, 6, Seq.empty,
      df => Baselines.naiveFitted(df, 1))
    val fc = SeriesFrame.withTestFlag(
      SeriesFrame.withMonthlyHorizon(base, 6), 6)
    val withYhat = Baselines.naiveForecast(fc, 1)
    val out = Conformal.dynamicIntervals(scored, withYhat)
    val rows = out.filter(col("is_future")).orderBy("ds")
      .select((col("upper") - col("lower")).as("w")).collect().map(_.getDouble(0))
    assert(rows.length === 6 && rows.forall(_ > 0))
    // per-step widths vary across the horizon (flat conformal would be constant)
    assert(rows.distinct.size > 1)
  }

  test("lineUpDates trims to the common range") {
    import spark.implicits._
    val a = obsSeries((1 to 10).map(_.toDouble), "a")
    val b = obsSeries((1 to 6).map(_.toDouble), "b")
    val trimmed = SeriesFrame.lineUpDates(a.unionByName(b))
    assert(trimmed.filter(col("series_id") === "a").count() === 6)
  }

  test("ingestXvars dummies categoricals and zero-pads missing dates") {
    import spark.implicits._
    val frame = obsSeries((1 to 4).map(_.toDouble))
    val xv = Seq(
      (java.sql.Date.valueOf("2020-01-01"), 5.0, "red"),
      (java.sql.Date.valueOf("2020-02-01"), 6.0, "blue")
    ).toDF("ds", "temp", "color")
    val out = SeriesFrame.ingestXvars(frame, xv)
    assert(out.columns.contains("color_red") && out.columns.contains("color_blue"))
    val padded = out.filter(col("ds") === "2020-03-01").first()
    assert(padded.getAs[Double]("temp") === 0.0)
    assert(padded.getAs[Double]("color_red") === 0.0)
  }

  test("model save/load round-trips predictions (transfer_predict)") {
    val base = graft.functions.FeatureOps.addArTerms(obsSeries(ys), 2)
    val est = MllibTsEstimator("mlr", Seq("ar_1", "ar_2"))
    val model = est.fit(base)
    val path = java.nio.file.Files.createTempDirectory("graft-model").toString + "/m"
    MllibTsEstimator.save(model, path)
    val loaded = MllibTsEstimator.load(path)
    val a = col1(model.transform(base), "yhat")
    val b = col1(loaded.transform(base), "yhat")
    a.zip(b).foreach { case (x, y2) => assert(x.isNaN && y2.isNaN || x == y2) }
  }
}
