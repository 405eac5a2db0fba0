package graft

import graft.core.SeriesFrame
import graft.core.SeriesFrame._
import graft.functions.FeatureOps
import graft.models.{MllibTsEstimator, MvForecast, Recursive, RowScorer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The recursive forecaster has two physical strategies — the row-scorer
  * mapGroups walk and the generic whole-frame ledger — that must be
  * value-identical (they're the same recursion batched differently). */
class RecursivePathsSpec extends SparkSpec {

  private def vals(df: DataFrame): Map[(String, java.sql.Date), Double] =
    df.select(col(SeriesId), col(Ds), col("yhat")).collect()
      .filterNot(r => r.isNullAt(2) || r.getDouble(2).isNaN)
      .map(r => (r.getString(0), r.getDate(1)) -> r.getDouble(2)).toMap

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val (va, vb) = (vals(a), vals(b))
    assert(va.keySet === vb.keySet)
    va.foreach { case (k, x) => assert(math.abs(x - vb(k)) < 1e-9, s"$k: $x vs ${vb(k)}") }
  }

  private def twoSeries(h: Int): DataFrame = {
    val a = obsSeries((1 to 30).map(t => 10.0 + 0.5 * t + 3 * math.sin(t / 2.0)), "a")
    val b = obsSeries((1 to 30).map(t => 50.0 - 0.3 * t + 2 * math.cos(t / 3.0)), "b")
    SeriesFrame.withMonthlyHorizon(a.unionByName(b), h)
  }

  test("dynamicForecast: scorer path == ledger path (mlr, AR(3), 2 series)") {
    val withAr = FeatureOps.addArTerms(twoSeries(8), 3)
    val model = MllibTsEstimator("mlr", Seq("ar_1", "ar_2", "ar_3")).fit(withAr)
    val sc = RowScorer.unwrap(model)
    assert(sc.isDefined, "mlr pipeline must be row-scorable")
    assertSame(
      Recursive.dynamicForecastScorer(withAr, model, sc.get),
      Recursive.dynamicForecastLedger(withAr, model))
  }

  test("dynamicForecast: scorer path == ledger path (gbt tree model)") {
    val withAr = FeatureOps.addArTerms(twoSeries(6), 2)
    val model = MllibTsEstimator("gbt", Seq("ar_1", "ar_2"),
      params = Map("n_estimators" -> 10.0, "max_depth" -> 3.0)).fit(withAr)
    val sc = RowScorer.unwrap(model)
    assert(sc.isDefined, "gbt pipeline must be row-scorable")
    assertSame(
      Recursive.dynamicForecastScorer(withAr, model, sc.get),
      Recursive.dynamicForecastLedger(withAr, model))
  }

  test("dynamicTestForecast: scorer path == wavefront ledger path (AR(2), k=3)") {
    val base = FeatureOps.addArTerms(twoSeries(0), 2)
    val flagged = SeriesFrame.withTestFlag(base, 9)
    val model = MllibTsEstimator("mlr", Seq("ar_1", "ar_2")).fit(flagged)
    val sc = RowScorer.unwrap(model)
    assert(sc.isDefined)
    assertSame(
      Recursive.dynamicTestForecastScorer(flagged, model, 3, sc.get),
      Recursive.dynamicTestForecastLedger(flagged, model, 3))
  }

  test("scaler pipelines are not row-scorable and fall back to the ledger") {
    val withAr = FeatureOps.addArTerms(twoSeries(4), 1)
    val model = MllibTsEstimator("mlr", Seq("ar_1"), normalizer = "scale").fit(withAr)
    assert(RowScorer.unwrap(model).isEmpty)
    // dispatch still produces a forecast on every horizon row
    val out = Recursive.dynamicForecast(withAr, model)
    assert(out.filter(col(IsFuture) && col("yhat").isNotNull).count() === 8)
  }

  test("MV dynamicForecast: coupled-set scorer path == step-wise ledger path") {
    val sids = Seq("a", "b")
    val frame0 = twoSeries(6)
    val withXl = MvForecast.addCrossSeriesLags(frame0, sids, 2)
    val models = MvForecast.fitPerSeries(withXl, sids, 2)
    val scorers = sids.flatMap(s => RowScorer.unwrap(models(s)).map(s -> _)).toMap
    assert(scorers.size === 2)
    assertSame(
      MvForecast.dynamicForecastScorer(withXl, models, sids, 2, scorers),
      MvForecast.dynamicForecastLedger(withXl, models, sids, 2))
  }
}
