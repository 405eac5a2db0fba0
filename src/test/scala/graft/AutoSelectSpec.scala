package graft

import graft.eval.AutoSelect
import graft.operators.Transforms
import org.apache.spark.sql.functions._

class AutoSelectSpec extends SparkSpec {

  val ar1: Seq[Double] = Iterator.iterate(50.0)(v => 10.0 + 0.8 * v).take(60).toSeq
    .zipWithIndex.map { case (v, t) => v + ((t * 29) % 7) - 3 }

  test("autoAr picks a small order for an AR(1)-ish process") {
    val (p, aic) = AutoSelect.autoAr(obsSeries(ar1), maxP = 5)
    assert(p >= 1 && p <= 5 && !aic.isNaN)
  }

  test("findSeasonalLength detects the annual cycle") {
    val ys = (0 until 72).map(t => 100.0 + 30 * math.sin(2 * math.Pi * t / 12.0))
    assert(AutoSelect.findSeasonalLength(obsSeries(ys)) === 12)
  }

  test("reduceXvars drops a pure-noise feature before a real one") {
    val ys = (0 until 60).map(t => 10.0 + 2.0 * t + ((t * 31) % 5) - 2)
    val df = graft.functions.FeatureOps.addTimeTrend(obsSeries(ys))
      .withColumn("noise", pmod(col("t") * 7919, lit(11)).cast("double"))
    val (kept, rmse) = AutoSelect.reduceXvars(df, Seq("t", "noise"), 6)
    assert(kept.contains("t"), s"kept=$kept")
    assert(!rmse.isNaN)
  }

  test("limitGridSize deterministic subsample") {
    val g = (1 to 100).toList
    val s1 = AutoSelect.limitGridSize(g, 10)
    val s2 = AutoSelect.limitGridSize(g, 10)
    assert(s1 === s2 && s1.size === 10)
  }

  test("periodogram peaks at the true frequency") {
    val ys = (0 until 48).map(t => 10 * math.sin(2 * math.Pi * 4 * t / 48.0))
    val p = AutoSelect.periodogram(obsSeries(ys))
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    assert(p.maxBy(_._2)._1 === 4)
  }

  test("boxcoxMleT picks λ≈0 for an exponential series") {
    val ys = (0 until 50).map(t => math.exp(2.0 + 0.05 * t))
    val t0 = Transforms.boxcoxMleT(obsSeries(ys))
    val lambda = t0.params.select("p1").first().getDouble(0)
    assert(math.abs(lambda) <= 0.3, s"λ=$lambda")
  }
}
