package graft

import graft.operators.Transforms
import org.apache.spark.sql.DataFrame

/** Transform→revert round-trips restore y exactly (the reference's strongest
  * correctness property, /root/reference/test/test_SeriesTransformer.py:22-53;
  * we target 1e-8 per BASELINE.md). */
class TransformsSpec extends SparkSpec {

  // positive trend + seasonality + deterministic "noise"
  val y: Seq[Double] = (0 until 48).map(t =>
    100.0 + 0.5 * t + 20 * math.sin(2 * math.Pi * (t % 12) / 12.0) + ((t * 37) % 11) - 5)

  def roundTrip(name: String)(mk: DataFrame => graft.operators.FittedTransform): Unit =
    test(s"$name revert∘transform == id") {
      val df = obsSeries(y)
      val t = mk(df)
      val back = col1(t.revert(t.transform(df)), "y")
      y.zip(back).foreach { case (a, b) => assert(math.abs(a - b) < 1e-8, s"$a vs $b") }
    }

  roundTrip("log")(Transforms.logT)
  roundTrip("sqrt")(Transforms.sqrtT)
  roundTrip("boxcox λ=0.5")(Transforms.boxcoxT(_, 0.5))
  roundTrip("boxcox λ=0 (ln)")(Transforms.boxcoxT(_, 0.0))
  roundTrip("scale")(Transforms.scaleT(_))
  roundTrip("minmax")(Transforms.minmaxT(_))
  roundTrip("robust")(Transforms.robustT(_))
  roundTrip("diff m=1")(Transforms.diffT(_, 1))
  roundTrip("diff m=12")(Transforms.diffT(_, 12))
  roundTrip("detrend linear")(Transforms.detrendLinearT(_))
  roundTrip("detrend poly order 2")(Transforms.detrendPolyT(_, 2))
  roundTrip("detrend ln")(Transforms.detrendLnT(_))
  roundTrip("detrend loess")(Transforms.detrendLoessT(_))
  roundTrip("yeo-johnson mle")(Transforms.yeoJohnsonMleT(_))
  roundTrip("deseason m=12")(Transforms.deseasonT(_, 12))

  test("yeo-johnson handles negative values; poly detrend flattens a quadratic") {
    val neg = (0 until 40).map(t => math.sin(t / 3.0) * 10 - 2.0) // mixed sign
    val df = obsSeries(neg)
    val t = Transforms.yeoJohnsonMleT(df)
    val back = col1(t.revert(t.transform(df)), "y")
    neg.zip(back).foreach { case (a, b) => assert(math.abs(a - b) < 1e-8) }

    val quad = (1 to 40).map(t => 5.0 + 0.3 * t + 0.05 * t * t)
    val dq = obsSeries(quad)
    val resid = col1(Transforms.detrendPolyT(dq, 2).transform(dq), "y")
    assert(resid.map(math.abs).max < 1e-6, "quadratic should detrend to ~0")
  }

  test("STL recovers trend and seasonality of a synthetic series") {
    import org.apache.spark.sql.functions.{abs => sabs, avg, col}
    val m = 12
    val series = (0 until 96).map(t =>
      50.0 + 0.5 * t + 8 * math.sin(2 * math.Pi * (t % m) / m))
    val out = Transforms.stl(obsSeries(series), m).cache()
    // residuals should be small relative to the seasonal amplitude
    val residMae = out.agg(avg(sabs(col("resid")))).first().getDouble(0)
    assert(residMae < 1.5, s"resid MAE $residMae")
    // the seasonal component should carry most of the sine's swing
    val seasRange = out.agg(org.apache.spark.sql.functions.max(col("seasonal"))
      - org.apache.spark.sql.functions.min(col("seasonal"))).first().getDouble(0)
    assert(seasRange > 10.0, s"seasonal range $seasRange")
  }

  test("loess trend tracks a smooth curve closely") {
    val smooth = (0 until 60).map(t => 50.0 + 10 * math.sin(t / 9.0))
    val df = obsSeries(smooth)
    val resid = col1(Transforms.detrendLoessT(df, frac = 0.3).transform(df), "y")
    assert(resid.map(math.abs).max < 1.0, s"max resid ${resid.map(math.abs).max}")
  }

  test("stacked log→diff(1)→diff(12) reverts exactly") {
    val df = obsSeries(y)
    val t1 = Transforms.logT(df)
    val s1 = t1.transform(df)
    val t2 = Transforms.diffT(s1, 1)
    val s2 = t2.transform(s1)
    val t3 = Transforms.diffT(s2, 12)
    val s3 = t3.transform(s2)
    val stack = graft.operators.TransformStack(List(t1, t2, t3))
    val back = col1(stack.revert(s3), "y")
    y.zip(back).foreach { case (a, b) => assert(math.abs(a - b) < 1e-8) }
  }

  test("scale params are per-series (multi-series frame)") {
    val df = obsSeries(y, "a").unionByName(obsSeries(y.map(_ * 10), "b"))
    val t = Transforms.scaleT(df)
    val z = t.transform(df)
    // both series z-score to the same values
    val za = col1(z.filter(z("series_id") === "a"), "y")
    val zb = col1(z.filter(z("series_id") === "b"), "y")
    za.zip(zb).foreach { case (p, q) => assert(math.abs(p - q) < 1e-8) }
  }
}
