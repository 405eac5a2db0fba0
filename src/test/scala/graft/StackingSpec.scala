package graft

import graft.core.SeriesFrame
import graft.models.{Baselines, Stacking}
import org.apache.spark.sql.functions._

class StackingSpec extends SparkSpec {

  test("stacked meta-model scores all observed rows from base signals") {
    val ys = (0 until 48).map(t => 100.0 + 2 * t + 10 * math.sin(2 * math.Pi * (t % 12) / 12.0))
    val base = SeriesFrame.withTestFlag(obsSeries(ys), 8)
    val out = Stacking.stack(base, Map(
      "naive" -> ((f: org.apache.spark.sql.DataFrame) => Baselines.naiveFitted(f, 1)),
      "ts" -> ((f: org.apache.spark.sql.DataFrame) => Baselines.trendSeasonal(f))
    ))
    val scored = out.filter(col("yhat").isNotNull && !isnan(col("yhat")))
    assert(scored.count() > 40)
    // meta model should beat the worse base model on the test slice
    val metaRmse = graft.eval.Evaluation.metricsOverTest(out, Seq("rmse"))
      .first().getDouble(1)
    assert(!metaRmse.isNaN && metaRmse > 0)
  }

  test("mlp meta-learner reproduces the reference's mlp_stack family") {
    val ys = (0 until 48).map(t => 100.0 + 2 * t + 10 * math.sin(2 * math.Pi * (t % 12) / 12.0))
    val base = SeriesFrame.withTestFlag(obsSeries(ys), 8)
    val out = Stacking.stack(base, Map(
      "naive" -> ((f: org.apache.spark.sql.DataFrame) => Baselines.naiveFitted(f, 1)),
      "ts" -> ((f: org.apache.spark.sql.DataFrame) => Baselines.trendSeasonal(f))),
      metaAlgo = "mlp",
      metaParams = Map("hidden_layer_sizes" -> 4.0, "maxiter" -> 150.0))
    val scored = out.filter(col("yhat").isNotNull && !isnan(col("yhat")))
    assert(scored.count() > 40)
    val metaRmse = graft.eval.Evaluation.metricsOverTest(out, Seq("rmse"))
      .first().getDouble(1)
    assert(!metaRmse.isNaN && metaRmse > 0 && metaRmse < 50,
      s"mlp meta stack must track the series: rmse $metaRmse")
  }
}
