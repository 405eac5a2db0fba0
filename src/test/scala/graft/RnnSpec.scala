package graft

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.models.RnnNet
import org.apache.spark.sql.functions._

/** Native rnn / lstm estimators ([[graft.models.RnnNet]]): hand-derived BPTT
  * gradients vs central finite differences, window-design alignment,
  * determinism, columnar-vs-local scoring parity, facade routing, and the
  * per-series executor path. */
class RnnSpec extends SparkSpec {

  /** Deterministic pseudo-data: smooth, nonzero, mixed-sign. */
  private def mat(n: Int, d: Int, phase: Double): DenseMatrix[Double] =
    DenseMatrix.tabulate(n, d)((i, j) => math.sin(phase + i * 0.7 + j * 1.3) * 0.8)

  private def fdCheck(lstm: Boolean): Unit = {
    val (n, d, u, w) = (5, 4, 3, 2)
    val x = mat(n, d, 0.2)
    val y = mat(n, w, 1.1)
    val g = if (lstm) 4 else 1
    val np = g * u + g * u * u + g * u + w * u + w
    // a generic (non-symmetric, nonzero-bias) parameter point
    val theta = DenseVector.tabulate(np)(i => math.sin(i * 0.61 + 0.3) * 0.5)
    val (_, grad) = RnnNet.lossGrad(lstm, u, w, x, y, alpha = 1e-3)(theta)
    val eps = 1e-6
    var worst = 0.0
    var i = 0
    while (i < np) {
      val tp = theta.copy; tp(i) += eps
      val tm = theta.copy; tm(i) -= eps
      val fp = RnnNet.lossGrad(lstm, u, w, x, y, 1e-3)(tp)._1
      val fm = RnnNet.lossGrad(lstm, u, w, x, y, 1e-3)(tm)._1
      val fd = (fp - fm) / (2 * eps)
      val rel = math.abs(fd - grad(i)) / math.max(1.0, math.abs(fd))
      if (rel > worst) worst = rel
      i += 1
    }
    assert(worst < 1e-6, s"BPTT gradient (lstm=$lstm) off by $worst vs finite differences")
  }

  test("rnn BPTT gradient matches central finite differences") { fdCheck(lstm = false) }
  test("lstm BPTT gradient matches central finite differences") { fdCheck(lstm = true) }

  test("window design aligns row i's input with targets y[i..i+w-1], never crossing series") {
    val feats = Array.tabulate(8)(i => Array(i.toDouble))
    val ys = Array.tabulate(8)(i => 10.0 + i)
    // two series: [0,5) and [5,8)
    val (x, y) = RnnNet.windowDesign(feats, ys, Array(0, 5), width = 3)
    // series 1 yields rows 0..2, series 2 yields row 5: 4 windows
    assert(x.rows == 4 && y.cols == 3)
    assert(x(0, 0) == 0.0 && y(0, 0) == 10.0 && y(0, 2) == 12.0)
    assert(x(2, 0) == 2.0 && y(2, 2) == 14.0) // last full window of series 1
    assert(x(3, 0) == 5.0 && y(3, 0) == 15.0 && y(3, 2) == 17.0)
  }

  test("fits are deterministic across refits") {
    val ys = (0 until 40).map(t => 20 + 5 * math.sin(t / 3.0))
    val frame = graft.functions.FeatureOps.addArTerms(obsSeries(ys), 3)
    val a = RnnNet.fit(frame, Seq("ar_1", "ar_2", "ar_3"), "lstm", width = 2,
      units = 4, maxIter = 60)
    val b = RnnNet.fit(frame, Seq("ar_1", "ar_2", "ar_3"), "lstm", width = 2,
      units = 4, maxIter = 60)
    assert(a.wIn.sameElements(b.wIn) && a.bOut.sameElements(b.bOut))
    assert(a.wRec.flatMap(_.toSeq).sameElements(b.wRec.flatMap(_.toSeq)))
  }

  test("columnar unrolled scoring equals the local recurrence at 1e-9 (both cells)") {
    val ys = (0 until 50).map(t => 15 + 4 * math.sin(t / 4.0) + 0.1 * t)
    val feats = Seq("ar_1", "ar_2", "ar_3", "ar_4")
    val frame = graft.functions.FeatureOps.addArTerms(obsSeries(ys), 4)
    for (cell <- Seq("rnn", "lstm")) {
      val m = RnnNet.fit(frame, feats, cell, width = 3, units = 4, maxIter = 40)
      val scored = RnnNet.scoreFrame(frame, m, feats)
        .filter(col("ar_4").isNotNull)
        .select("ds", "yhat", "ar_1", "ar_2", "ar_3", "ar_4")
        .collect().sortBy(_.getDate(0).getTime)
      assert(scored.nonEmpty)
      scored.foreach { r =>
        val x = Array.tabulate(4)(j => r.getDouble(2 + j))
        val want = m.predict(x)(0)
        assert(math.abs(r.getDouble(1) - want) < 1e-9,
          s"$cell columnar mismatch at ${r.getDate(0)}: ${r.getDouble(1)} vs $want")
      }
    }
  }

  test("rnn learns a lag-predictable pattern far better than the mean") {
    // y_t = 0.9·y_{t-1} structure: AR(1) is the whole signal
    val ys = Iterator.iterate(30.0)(v => 10 + 0.8 * v).take(60).toSeq
      .zipWithIndex.map { case (v, t) => v + 3 * math.sin(t / 2.0) }
    val feats = Seq("ar_1", "ar_2")
    val frame = graft.functions.FeatureOps.addArTerms(obsSeries(ys), 2)
    val m = RnnNet.fit(frame, feats, "rnn", width = 1, units = 8, maxIter = 300)
    val resid = RnnNet.scoreFrame(frame, m, feats)
      .filter(col("yhat").isNotNull && !isnan(col("yhat")))
      .select(col("y") - col("yhat")).collect().map(_.getDouble(0))
    val rmse = math.sqrt(resid.map(v => v * v).sum / resid.length)
    val sd = {
      val mu = ys.sum / ys.length
      math.sqrt(ys.map(v => (v - mu) * (v - mu)).sum / ys.length)
    }
    assert(rmse < sd / 3, s"rnn fitted rmse $rmse should beat the series sd $sd")
  }

  test("facade lstm: direct test window + horizon banked, CIs attached") {
    val ys = (0 until 72).map(t => 50 + 10 * math.sin(2 * math.Pi * t / 12.0) + 0.3 * t)
    val f = Forecaster(obsSeries(ys))
      .generateFutureDates(6)
      .setTestLength(12)
      .addArTerms(6)
      .setEstimator("lstm", Map("units" -> 6.0, "maxiter" -> 120.0))
      .manualForecast(callMe = "lstm_ar6")
    val banked = f.results.get
    val fut = banked.filter(col("is_future") && col("model") === "lstm_ar6")
    assert(fut.count() == 6, "all six horizon rows predicted")
    assert(fut.filter(col("yhat").isNull || isnan(col("yhat"))).count() == 0)
    val test = banked.filter(col("is_test") && col("model") === "lstm_ar6")
    assert(test.count() == 12 &&
      test.filter(col("yhat").isNull).count() == 0,
      "the direct window covers every test row")
    // the default grid exists for tune()
    assert(f.setEstimator("rnn").defaultGrid.nonEmpty)
  }

  test("genRnnGrid: deterministic in the seed, pool-bounded, estimator-keyed") {
    import graft.eval.Grids
    val g1 = Grids.genRnnGrid(layerTries = 12, cellPool = Seq("rnn", "lstm"),
      unitsPool = Seq(4, 8, 16), alphaPool = Seq(1e-4, 1e-3),
      maxiterPool = Seq(50, 100), seed = 7L)
    val g2 = Grids.genRnnGrid(layerTries = 12, cellPool = Seq("rnn", "lstm"),
      unitsPool = Seq(4, 8, 16), alphaPool = Seq(1e-4, 1e-3),
      maxiterPool = Seq(50, 100), seed = 7L)
    assert(g1 == g2, "same seed must regenerate the identical grid")
    val g3 = Grids.genRnnGrid(layerTries = 12, cellPool = Seq("rnn", "lstm"),
      unitsPool = Seq(4, 8, 16), alphaPool = Seq(1e-4, 1e-3),
      maxiterPool = Seq(50, 100), seed = 8L)
    assert(g1 != g3, "a different seed should sample a different grid")
    assert(g1.keySet.subsetOf(Set("rnn", "lstm")) && g1.nonEmpty)
    for ((cell, rows) <- g1; row <- rows) {
      assert(Set("rnn", "lstm")(cell))
      assert(Set(4.0, 8.0, 16.0)(row("units")), s"units off-pool: $row")
      assert(Set(1e-4, 1e-3)(row("alpha")), s"alpha off-pool: $row")
      assert(Set(50.0, 100.0)(row("maxiter")), s"maxiter off-pool: $row")
    }
    // every sampled architecture crosses the full maxiter axis, like the
    // reference's kwargs axes cross every layers_struct try
    for ((_, rows) <- g1) {
      val byArch = rows.groupBy(r => (r("units"), r("alpha")))
      byArch.foreach { case (arch, rs) =>
        assert(rs.map(_("maxiter")).toSet == Set(50.0, 100.0),
          s"architecture $arch missing a maxiter cell")
      }
      assert(rows.distinct == rows, "duplicate draws must collapse")
    }
    // invalid cells are rejected loudly
    intercept[IllegalArgumentException] {
      Grids.genRnnGrid(cellPool = Seq("gru"))
    }
  }

  test("a generated grid tunes end-to-end through the facade") {
    import graft.eval.Grids
    val ys = (0 until 48).map(t => 30 + 6 * math.sin(t / 3.0) + 0.2 * t)
    val grid = Grids.genRnnGrid(layerTries = 3, cellPool = Seq("rnn"),
      unitsPool = Seq(2, 3), alphaPool = Seq(1e-3),
      maxiterPool = Seq(25), seed = 1L)("rnn")
    val capped = graft.eval.AutoSelect.limitGridSize(grid, 2)
    assert(capped.size <= 2 && capped.forall(grid.contains))
    val f = Forecaster(obsSeries(ys))
      .generateFutureDates(3)
      .setTestLength(6)
      .addArTerms(3)
      .setEstimator("rnn")
      .tune(capped, k = 2, h = 6)
      .manualForecast(callMe = "rnn_gen")
    assert(capped.contains(f.params), "tune must keep one generated cell")
    val fut = f.results.get.filter(col("is_future") && col("model") === "rnn_gen")
    assert(fut.count() == 3 &&
      fut.filter(col("yhat").isNull || isnan(col("yhat"))).count() == 0)
  }

  test("fitPredictBySeries matches the driver fit per series and covers all series") {
    val sA = (0 until 40).map(t => 10 + 3 * math.sin(t / 3.0))
    val sB = (0 until 40).map(t => 50 - 0.5 * t + 2 * math.cos(t / 4.0))
    val frame = graft.functions.FeatureOps.addArTerms(
      graft.core.SeriesFrame.withMonthlyHorizon(
        obsSeries(sA, "a").unionByName(obsSeries(sB, "b")), 3), 2)
    val feats = Seq("ar_1", "ar_2")
    val grouped = RnnNet.fitPredictBySeries(frame, feats, "rnn", width = 3,
      units = 4, maxIter = 60)
    val bySeries = grouped.collect().groupBy(_.getString(0))
    assert(bySeries.keySet == Set("a", "b"))
    // each series: fitted rows (obs minus 2 lag-incomplete) + 3 future rows
    assert(bySeries("a").length == 38 + 3)
    // parity with the single-series driver fit on series a
    val aFrame = frame.filter(col("series_id") === "a")
    val mA = RnnNet.fit(aFrame, feats, "rnn", width = 3, units = 4, maxIter = 60)
    val colA = RnnNet.scoreFrame(aFrame, mA, feats)
      .filter(col("yhat").isNotNull && !isnan(col("yhat")))
      .select("ds", "yhat").collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    val grpA = bySeries("a").map(r => r.getDate(1).toString -> r.getDouble(2)).toMap
    colA.foreach { case (ds, v) =>
      assert(grpA.contains(ds), s"by-series path missing $ds")
      assert(math.abs(grpA(ds) - v) < 1e-9, s"by-series parity off at $ds")
    }
  }
}
