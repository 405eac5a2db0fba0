package graft

import graft.core.SeriesFrame
import graft.functions.FeatureOps
import graft.models.{MllibTsEstimator, Recursive}
import org.apache.spark.sql.functions._

/** The series-parallel claim, exercised: every window/ledger op must produce
  * complete per-series results when hundreds of series share one frame. */
class ManySeriesSpec extends SparkSpec {

  private val nSeries = 120
  private val nObs = 36

  private def manySeries(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (for (s <- 0 until nSeries; t <- 0 until nObs) yield {
      val sid = f"s$s%03d"
      val y = 20.0 + s * 0.5 + 0.8 * t + 3 * math.sin((t + s) / 3.0)
      (sid, java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusMonths(t)),
        Some(y), false)
    }).toDF("series_id", "ds", "y", "is_future")
  }

  test("dynamic forecast fills every series' full horizon from one shared ledger") {
    val base = SeriesFrame.withMonthlyHorizon(manySeries(), 4)
    val withAr = FeatureOps.addArTerms(base, 2)
    val model = MllibTsEstimator("mlr", Seq("ar_1", "ar_2")).fit(withAr)
    val fut = Recursive.dynamicForecast(withAr, model).filter(col("is_future"))
    assert(fut.count() == nSeries * 4L)
    assert(fut.filter(col("yhat").isNull || isnan(col("yhat"))).count() == 0,
      "every series' recursive steps must resolve from the ledger")
    // per-series horizons stay distinct (no cross-series ledger bleed):
    // forecasts should preserve the per-series level ordering
    val means = fut.groupBy("series_id").agg(avg("yhat").as("m"))
      .orderBy("series_id").collect().map(_.getDouble(1))
    assert(means.head < means.last, "series levels must be preserved")
  }

  test("dynamicTestForecast peeking works across many series at once") {
    val flagged = FeatureOps.addArTerms(
      SeriesFrame.withTestFlag(manySeries(), 8), 1)
    val model = MllibTsEstimator("mlr", Seq("ar_1")).fit(flagged)
    val scored = Recursive.dynamicTestForecast(flagged, model, 4)
      .filter(col("is_test"))
    assert(scored.count() == nSeries * 8L)
    assert(scored.filter(col("yhat").isNull || isnan(col("yhat"))).count() == 0)
  }

  test("inferFreq and withTestFlag stay per-series on a shared frame") {
    val df = manySeries()
    assert(SeriesFrame.inferFreq(df) == "MS")
    val flagged = SeriesFrame.withTestFlag(df, 5)
    val perSeries = flagged.filter(col("is_test"))
      .groupBy("series_id").count().collect()
    assert(perSeries.length == nSeries && perSeries.forall(_.getLong(1) == 5L))
  }
}
