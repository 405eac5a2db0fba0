package graft

import graft.models.Vecm
import org.apache.spark.sql.functions._

class VecmSpec extends SparkSpec {

  test("VECM one-step level predictions track a cointegrated pair") {
    // b error-corrects toward a: exact linear system the OLS can recover
    val n = 60
    val a = Array.ofDim[Double](n); val b = Array.ofDim[Double](n)
    a(0) = 50; b(0) = 45
    for (t <- 1 until n) {
      a(t) = a(t - 1) + 0.5 + (((t * 17) % 7) - 3) * 0.2
      b(t) = b(t - 1) + 0.4 * (a(t - 1) - b(t - 1)) // pulls toward a
    }
    val df = obsSeries(a.toSeq, "a").unionByName(obsSeries(b.toSeq, "b"))
    val out = Vecm.fitPredict(df, Seq("a", "b"), diffLags = 1)
    val scored = out.filter(col("yhat").isNotNull)
    assert(scored.count() > 100)
    // b's equation is exactly linear in the features → near-zero residuals
    val bErr = scored.filter(col("series_id") === "b")
      .agg(avg(abs(col("y") - col("yhat")))).first().getDouble(0)
    assert(bErr < 1e-6, s"b one-step error $bErr")
  }

  test("Johansen trace selects rank 1 on a cointegrated pair, 0 on independent walks") {
    val n = 120
    val rnd = new scala.util.Random(7)
    // cointegrated: x random walk, yc error-corrects toward x
    val x = Array.ofDim[Double](n); val yc = Array.ofDim[Double](n)
    x(0) = 10; yc(0) = 9
    for (t <- 1 until n) {
      x(t) = x(t - 1) + rnd.nextGaussian()
      yc(t) = yc(t - 1) + 0.6 * (x(t - 1) - yc(t - 1)) + 0.1 * rnd.nextGaussian()
    }
    val coint = obsSeries(x.toSeq, "x").unionByName(obsSeries(yc.toSeq, "yc"))
    val (lambda, trace, rank) = Vecm.johansenTrace(coint, Seq("x", "yc"))
    assert(lambda.length == 2 && trace.length == 2)
    assert(rank == 1, s"expected rank 1, got $rank (trace=${trace.mkString(",")})")

    // independent random walks: no cointegrating relation
    val u = Array.ofDim[Double](n); val v = Array.ofDim[Double](n)
    u(0) = 5; v(0) = 8
    for (t <- 1 until n) {
      u(t) = u(t - 1) + rnd.nextGaussian()
      v(t) = v(t - 1) + rnd.nextGaussian()
    }
    val indep = obsSeries(u.toSeq, "u").unionByName(obsSeries(v.toSeq, "v"))
    val rank0 = Vecm.findOptimalCointRank(indep, Seq("u", "v"))
    assert(rank0 == 0, s"expected rank 0, got $rank0")
  }
}
