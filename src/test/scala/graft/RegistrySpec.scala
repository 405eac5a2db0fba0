package graft

import graft.core.SeriesFrame
import graft.functions.{FeatureOps, Metrics}
import graft.models.MllibTsEstimator
import org.apache.spark.sql.functions._

/** The reference's user-extensibility surface
  * (`add_sklearn_estimator` _Forecaster_parent.py:786-814, `add_normalizer`
  * 1944-1955, `set_metrics` 1133-1164, `set_grids_file`
  * GridGenerator.py:3-32): registered estimators/normalizers/metrics/grids
  * flow through the same pipeline, scoring, and registry plumbing as the
  * builtins. */
class RegistrySpec extends SparkSpec {

  private def flagged = {
    val ys = (0 until 50).map(i => 10.0 + 0.5 * i + math.sin(i / 2.0))
    SeriesFrame.withTestFlag(FeatureOps.addArTerms(obsSeries(ys), 1), 8)
  }

  test("a registered estimator fits through the standard pipeline") {
    MllibTsEstimator.registerEstimator("dtree") { spec =>
      new org.apache.spark.ml.regression.DecisionTreeRegressor()
        .setSeed(spec.seed)
        .setMaxDepth(spec.params.getOrElse("max_depth", 3.0).toInt)
        .setFeaturesCol(spec.featuresCol).setLabelCol(spec.labelCol)
        .setPredictionCol(spec.predictionCol)
    }
    val est = MllibTsEstimator("dtree", Seq("ar_1"), Map("max_depth" -> 2.0))
    val scored = est.fit(flagged).transform(flagged)
      .filter(col("ar_1").isNotNull && !isnan(col("yhat")))
    assert(scored.count() > 0)
    // builtins cannot be shadowed
    intercept[IllegalArgumentException](
      MllibTsEstimator.registerEstimator("mlr")(_ => null))
    intercept[IllegalArgumentException](
      MllibTsEstimator.registerEstimator("mlp")(_ => null))
  }

  test("a registered normalizer slots into the scaler stage") {
    MllibTsEstimator.registerNormalizer("maxabs") { (in, out) =>
      new org.apache.spark.ml.feature.MaxAbsScaler().setInputCol(in).setOutputCol(out)
    }
    val est = MllibTsEstimator("mlr", Seq("ar_1"), normalizer = "maxabs")
    val scored = est.fit(flagged).transform(flagged)
      .filter(col("ar_1").isNotNull && !isnan(col("yhat")))
    assert(scored.count() > 0)
    intercept[IllegalArgumentException](
      MllibTsEstimator.registerNormalizer("scale")((_, _) => null))
  }

  test("a registered metric scores through metricsOverTest and ranks") {
    Metrics.register("medae",
      (a, f) => percentile_approx(abs(f - a), lit(0.5), lit(1000)),
      lowerBetter = true)
    assert(Metrics.registry.contains("medae"))
    assert(Metrics.lowerIsBetter("medae"))
    val fit = graft.models.Ols.fit(flagged, Seq("ar_1"))
    val scored = flagged.withColumn("yhat", fit.predictExpr)
    val m = graft.eval.Evaluation.metricsOverTest(scored, Seq("rmse", "medae"))
    val row = m.first()
    assert(!row.getDouble(row.fieldIndex("medae")).isNaN)
    intercept[IllegalArgumentException](Metrics.register("rmse", (a, f) => avg(a)))
  }

  test("a registered grid overlays the defaults") {
    import graft.eval.Grids
    Grids.register("dtree", Grids.Grid(Map("max_depth" -> Seq(2, 3))))
    assert(Grids.gridFor("dtree").size === 2)
    // shadowing a default is allowed for grids (a user's Grids.py wins)
    Grids.register("gbt", Grids.Grid(Map("max_depth" -> Seq(2))))
    assert(Grids.gridFor("gbt").size === 1)
  }
}
