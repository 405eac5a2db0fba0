package graft

import graft.core.SeriesFrame
import graft.models.Arima
import org.apache.spark.sql.functions._

class ArimaSpec extends SparkSpec {

  // ARMA(1,1): y_t = 5 + 0.7 y_(t-1) + e_t + 0.4 e_(t-1); innovations from a
  // splitmix-style hash so they are effectively white (a periodic pattern
  // would violate the model and bias the estimate)
  private def white(t: Int): Double = {
    var z = t.toLong * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (math.abs(z % 2000001L).toDouble / 1000000.0) - 1.0
  }
  val es: Seq[Double] = (0 until 120).map(white)
  val ys: Seq[Double] = {
    val out = Array.ofDim[Double](120)
    out(0) = 16.0
    for (t <- 1 until 120)
      out(t) = 5.0 + 0.7 * out(t - 1) + es(t) + 0.4 * es(t - 1)
    out.toSeq
  }

  test("Hannan-Rissanen recovers ARMA(1,1)-ish coefficients") {
    val base = SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6)
    val fit = Arima.fitArma(base, p = 1, q = 1)
    val phi = fit.model.asInstanceOf[graft.models.OlsModel].fitted.beta(0)
    assert(math.abs(phi - 0.7) < 0.15, s"phi=$phi") // AR coefficient near truth
  }

  test("ARMA forecast continues the series level") {
    val base = SeriesFrame.withMonthlyHorizon(obsSeries(ys), 6)
    val fit = Arima.fitArma(base, p = 1, q = 1)
    val out = Arima.forecast(fit)
    val fc = col1(out.filter(col("is_future")), "yhat")
    assert(fc.length === 6 && fc.forall(v => !v.isNaN))
    // stationary mean = 5/(1-0.7) ≈ 16.7; forecasts should be in range
    assert(fc.forall(v => v > 10 && v < 25), s"fc=$fc")
  }

  test("seasonal ARMA captures a strong annual lag the plain ARMA misses") {
    val m = 12
    // seasonal AR: y_t = 2 + 0.8 y_(t-12) + e_t
    val sys = {
      val out = Array.ofDim[Double](144)
      for (t <- 0 until 12) out(t) = 10.0 + (t % 5)
      for (t <- 12 until 144) out(t) = 2.0 + 0.8 * out(t - 12) + 0.3 * white(t)
      out.toSeq
    }
    val base = SeriesFrame.withMonthlyHorizon(obsSeries(sys), 12)
    val fit = Arima.fitSarma(base, p = 1, q = 1, bigP = 1, bigQ = 0, m = m)
    // features = ar_1, ar_12, elag_1 — the seasonal coefficient carries it
    val phiSeason = fit.model.asInstanceOf[graft.models.OlsModel].fitted.beta(1)
    assert(math.abs(phiSeason - 0.8) < 0.2, s"phi_12=$phiSeason")
    val fc = col1(Arima.forecast(fit).filter(col("is_future")), "yhat")
    assert(fc.length === 12 && fc.forall(v => !v.isNaN))
  }
}
