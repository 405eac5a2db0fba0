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
}
