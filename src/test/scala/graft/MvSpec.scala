package graft

import graft.core.SeriesFrame
import graft.models.MvForecast
import org.apache.spark.sql.functions._

class MvSpec extends SparkSpec {

  // y2 follows y1 with a lag — cross-series structure a VAR can learn
  val y1: Seq[Double] = (0 until 40).map(t => 10.0 + 0.5 * t + 3 * math.sin(t / 3.0))
  val y2: Seq[Double] = 5.0 +: y1.dropRight(1).map(v => 0.7 * v + 1.0)

  def mvFrame = obsSeries(y1, "a").unionByName(obsSeries(y2, "b"))

  test("coupled cross-lag OLS refuses an oversized series set loudly") {
    val ids = (0 to MvForecast.CoupledSetMax).map(i => s"s$i")
    val e = intercept[IllegalArgumentException](
      MvForecast.fitPerSeriesOls(mvFrame, ids, 1))
    assert(e.getMessage.contains("coupled cross-lag"), e.getMessage)
  }

  test("addCrossSeriesLags builds xlag columns for every series") {
    val out = MvForecast.addCrossSeriesLags(mvFrame, Seq("a", "b"), 2)
    Seq("xlag_a_1", "xlag_a_2", "xlag_b_1", "xlag_b_2").foreach(c =>
      assert(out.columns.contains(c)))
    // row of series b at position 5 sees a's value at position 4
    val r = out.filter(col("series_id") === "b").orderBy("ds").collect()(5)
    assert(math.abs(r.getAs[Double]("xlag_a_1") - y1(4)) < 1e-12)
  }

  test("MV dynamic forecast: b's model learns b_t = 0.7*a_(t-1) + 1 exactly") {
    val base = SeriesFrame.withMonthlyHorizon(mvFrame, 4)
    val withLags = MvForecast.addCrossSeriesLags(base, Seq("a", "b"), 1)
    val models = MvForecast.fitPerSeries(withLags, Seq("a", "b"), 1)
    val out = MvForecast.dynamicForecast(withLags, models, Seq("a", "b"), 1)
    val bFc = col1(out.filter(col("series_id") === "b" && col("is_future")), "yhat")
    val aFc = col1(out.filter(col("series_id") === "a" && col("is_future")), "yhat")
    assert(bFc.length === 4 && aFc.length === 4)
    // step 1 of b must be 0.7*a_T + 1 (exact linear relation, OLS recovers it)
    assert(math.abs(bFc.head - (0.7 * y1.last + 1.0)) < 1e-6, s"got ${bFc.head}")
    // step 2 of b consumes a's step-1 PREDICTION through the shared ledger
    assert(math.abs(bFc(1) - (0.7 * aFc.head + 1.0)) < 1e-5)
  }
}
