package graft

import graft.core.SeriesFrame
import graft.models.{MllibTsEstimator, MlpNet, Svr}
import org.apache.spark.sql.functions._

/** Native svr / mlp estimators ([[graft.models.Svr]], [[graft.models.MlpNet]]):
  * fit quality on known functions, the ε-SVR KKT tube structure,
  * determinism across refits/partitionings, and registry + facade routing. */
class SvrMlpSpec extends SparkSpec {

  test("svr recovers a linear signal within the epsilon tube") {
    val ys = (0 until 60).map(t => 5.0 + 0.5 * t)
    val frame = graft.functions.FeatureOps.addTimeTrend(obsSeries(ys))
    val model = Svr.fit(frame, Seq("t"), c = 100.0, epsilon = 0.05)
    val scored = model.transform(frame).orderBy("ds").collect()
    scored.foreach { r =>
      assert(math.abs(r.getAs[Double]("yhat") - r.getAs[Double]("y")) < 0.2,
        s"svr linear fit off at ${r.getAs[Any]("ds")}")
    }
  }

  test("svr KKT structure: rows strictly inside the tube carry zero dual weight") {
    // nonlinear target so some duals saturate and some rows sit inside
    val ys = (0 until 80).map(t => math.sin(t / 6.0) * 10 + 20)
    val frame = graft.functions.FeatureOps.addTimeTrend(obsSeries(ys))
    val eps = 0.5
    val model = Svr.fit(frame, Seq("t"), c = 10.0, epsilon = eps)
    val resid = model.transform(frame)
      .select(col("y"), col("yhat")).collect()
      .map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    // exact KKT at the optimum: a zero-dual row (not a support vector)
    // has its own kernel term absent, so its full residual obeys |r| ≤ ε.
    // Every row with |r| > ε must therefore be a support vector.
    val nSv = model.numSupportVectors
    assert(nSv < resid.length, "the dual must be sparse (some β = 0)")
    assert(resid.count(_ > eps + 1e-6) <= nSv,
      s"rows outside the tube (${resid.count(_ > eps + 1e-6)}) must all be SVs ($nSv)")
    assert(resid.max < 5.0, "no unbounded violations")
  }

  test("mlp fits a smooth nonlinear curve a linear model cannot") {
    val ys = (0 until 80).map(t => { val x = (t - 40) / 20.0; x * x * 10 + 5 })
    val frame = graft.functions.FeatureOps.addTimeTrend(obsSeries(ys))
    val mlp = MlpNet.fit(frame, Seq("t"), hidden = 8, maxIter = 500)
    val rmseMlp = math.sqrt(
      mlp.transform(frame).select(avg(pow(col("yhat") - col("y"), 2)))
        .head().getDouble(0))
    val ols = graft.models.OlsModel(graft.models.Ols.fit(frame, Seq("t")))
    val rmseOls = math.sqrt(
      ols.transform(frame).select(avg(pow(col("yhat") - col("y"), 2)))
        .head().getDouble(0))
    assert(rmseMlp < rmseOls / 5,
      s"mlp must beat the linear fit on a parabola: $rmseMlp vs $rmseOls")
  }

  test("both models are deterministic across refits and partitionings") {
    val ys = (0 until 48).map(t => math.sin(t / 3.0) * 5 + t * 0.2)
    val frame = graft.functions.FeatureOps.addArTerms(
      graft.functions.FeatureOps.addTimeTrend(obsSeries(ys)), 1)
    def preds(f: org.apache.spark.sql.DataFrame): Seq[Double] = {
      val svr = Svr.fit(f, Seq("t", "ar_1")).transform(f)
      val mlp = MlpNet.fit(f, Seq("t", "ar_1"), maxIter = 100).transform(f)
      col1(svr.filter(col("ar_1").isNotNull), "yhat") ++
        col1(mlp.filter(col("ar_1").isNotNull), "yhat")
    }
    val a = preds(frame)
    val b = preds(frame.repartition(7))
    a.zip(b).foreach { case (x, y) => assert(x === y, "fit must be bit-stable") }
  }

  test("fitPredictBySeries matches the driver fit per series and scales out") {
    import org.apache.spark.sql.DataFrame
    // 60 series with distinct shapes; per-series executor fits must
    // reproduce the driver path's predictions series by series
    val frames: Seq[DataFrame] = (0 until 60).map { s =>
      val ys = (0 until 40).map(t => 10.0 + s % 7 + 0.2 * t + math.sin((t + s) / 3.0))
      graft.functions.FeatureOps.addTimeTrend(obsSeries(ys, s"s$s"))
    }
    val all = frames.reduce(_ unionByName _).repartition(8)
    val grouped = Svr.fitPredictBySeries(all, Seq("t"))
    assert(grouped.select("series_id").distinct().count() === 60)
    assert(grouped.count() === 60L * 40)
    // spot-check three series against the driver/broadcast path
    for (sid <- Seq("s0", "s13", "s59")) {
      val one = frames(sid.drop(1).toInt)
      val driver = Svr.fit(one, Seq("t")).transform(one)
        .orderBy("ds").collect().map(_.getAs[Double]("yhat"))
      val dist = grouped.filter(col("series_id") === sid)
        .orderBy("ds").collect().map(_.getAs[Double]("yhat"))
      driver.zip(dist).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"$sid: $a vs $b") }
    }
    // mlp twin: complete per-series coverage + parity on one series
    val mg = MlpNet.fitPredictBySeries(all, Seq("t"), maxIter = 60)
    assert(mg.select("series_id").distinct().count() === 60)
    val oneM = MlpNet.fit(frames(5), Seq("t"), maxIter = 60)
      .transform(frames(5)).orderBy("ds").collect().map(_.getAs[Double]("yhat"))
    val distM = mg.filter(col("series_id") === "s5")
      .orderBy("ds").collect().map(_.getAs[Double]("yhat"))
    oneM.zip(distM).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"mlp s5: $a vs $b") }
  }

  test("conformal bounds attach to the svr by-series path per series") {
    val frames = (0 until 8).map { s =>
      val ys = (0 until 40).map(t => 10.0 + s + 0.2 * t + math.sin((t + s) / 3.0))
      graft.functions.FeatureOps.addTimeTrend(
        graft.core.SeriesFrame.withMonthlyHorizon(obsSeries(ys, s"s$s"), 3))
    }
    val flagged = graft.core.SeriesFrame.withTestFlag(
      frames.reduce(_ unionByName _), 12)
    val scored = Svr.fitPredictBySeries(flagged, Seq("t"), maxSweeps = 100)
    val out = graft.operators.Conformal.attachBySeries(flagged, scored)
    val fut = out.filter(col("is_future"))
    assert(fut.count() === 8L * 3)
    assert(fut.filter(col("lower").isNull || col("upper").isNull).count() === 0)
    assert(out.select("series_id", "ci_width").distinct().count() === 8L)
  }

  test("registry fit() routes svr/mlp and the facade banks a dynamic forecast") {
    val ys = (0 until 48).map(t => 10 + 0.3 * t + math.sin(t / 2.0))
    val base = SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6)
    for (algo <- Seq("svr", "mlp")) {
      val f = graft.Forecaster(base)
        .setTestLength(6).addTimeTrend().addArTerms(1)
        .setEstimator(algo).manualForecast(algo)
      val fc = col1(f.exportForecasts(), algo)
      assert(fc.size === 6 && fc.forall(v => !v.isNaN), s"$algo horizon complete")
      assert(fc.forall(v => v > 0 && v < 60), s"$algo forecast sane: $fc")
    }
  }
}
