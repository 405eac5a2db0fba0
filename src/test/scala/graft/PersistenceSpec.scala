package graft

import graft.core.SeriesFrame
import graft.models.MllibTsEstimator
import graft.operators.{Transforms, TransformStack}
import graft.results.PipelineStore
import org.apache.spark.sql.functions._

/** Whole-pipeline persistence (the reference's pickle round-trip): transform
  * stack + estimator spec + results store survive save/load bit-for-bit. */
class PersistenceSpec extends SparkSpec {

  test("pipeline save/load round-trips transform stack, estimator spec, results") {
    val ys = (1 to 60).map(i => 50.0 + 2 * i + 5 * math.sin(i / 2.0))
    val base = obsSeries(ys)
    val t1 = Transforms.scaleT(base)
    val z = t1.transform(base)
    val t2 = Transforms.diffT(z, 1)
    val t3v = Transforms.detrendPolyT(base, 2)
    val stack = TransformStack(List(t1, t2, t3v))
    val est = MllibTsEstimator("ridge", Seq("ar_1", "ar_2"), Map("alpha" -> 0.5), "scale", 7L)
    val results = base.withColumn("model", lit("naive"))
      .withColumn("yhat", lag(col("y"), 1).over(SeriesFrame.w))

    val path = java.nio.file.Files.createTempDirectory("plstore").toString
    PipelineStore.save(path, stack, spark, Some(est), Some(results))

    val stack2 = PipelineStore.loadStack(spark, path)
    assert(stack2.stack.size == 3)
    val before = col1(stack.transform(base), "y")
    val after = col1(stack2.transform(base), "y")
    before.zip(after).foreach { case (a, b) =>
      assert((a.isNaN && b.isNaN) || math.abs(a - b) < 1e-12, s"$a vs $b") }
    // revert through the RELOADED stack inverts the original stack's transform
    val reverted = col1(stack2.revert(stack.transform(base)), "y")
    reverted.zip(ys).foreach { case (r, y) => assert(math.abs(r - y) < 1e-8, s"$r vs $y") }

    val est2 = PipelineStore.loadEstimator(spark, path)
    assert(est2.isDefined)
    assert(est2.get.algo == "ridge" && est2.get.features == Seq("ar_1", "ar_2") &&
      est2.get.params == Map("alpha" -> 0.5) && est2.get.normalizer == "scale" &&
      est2.get.seed == 7L)
    val res2 = PipelineStore.loadResults(spark, path)
    assert(res2.isDefined && res2.get.count() == results.count())
  }

  test("addSeries pads a short regressor with zeros from the first date") {
    val base = obsSeries((1 to 10).map(_.toDouble))
    val out = SeriesFrame.addSeries(base, Seq(5.0, 6.0, 7.0), "x")
    assert(col1(out, "x") == Seq(5.0, 6.0, 7.0) ++ Seq.fill(7)(0.0))
    // explicit first_date offsets the series; uncovered leading dates pad 0
    val out2 = SeriesFrame.addSeries(base, Seq(5.0, 6.0), "x", Some("2020-03-01"))
    assert(col1(out2, "x") == Seq(0.0, 0.0, 5.0, 6.0) ++ Seq.fill(6)(0.0))
  }
}
