package graft.functions

import graft.core.SeriesFrame._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical diagnostics (SURVEY §2.9): ACF/PACF, augmented Dickey-Fuller,
  * D'Agostino-style normality, lagged cross-correlation. ACF and corr are
  * fully distributed aggregations; PACF (Durbin-Levinson) and the ADF
  * regression are driver-side closed-form math over tiny per-series
  * statistics — the "small-data driver math" tier reserved in SURVEY §4.
  */
object Diagnostics {

  /** statsmodels-convention ACF: r_k = Σ_(t>k)(y_t−ȳ)(y_(t−k)−ȳ) / Σ(y_t−ȳ)²
    * with the FULL-series mean in both factors and the lag-0 denominator
    * (/root/reference/src/scalecast/Forecaster.py:1320-1366 plot_acf).
    * One row per (series, lag). */
  def acf(df: DataFrame, maxLag: Int): DataFrame = {
    val obs = df.filter(!col(IsFuture))
    val means = obs.groupBy(SeriesId).agg(avg(Y).as("_mu"), count(lit(1)).as("_n"))
    val centered = obs.join(broadcast(means), Seq(SeriesId))
      .withColumn("_c", col(Y) - col("_mu"))
    val denom = centered.groupBy(SeriesId).agg(sum(col("_c") * col("_c")).as("_d"))
    val lags = (1 to maxLag).map { k =>
      centered
        .withColumn("_cl", lag(col("_c"), k).over(w))
        .filter(col("_cl").isNotNull)
        .groupBy(SeriesId).agg(sum(col("_c") * col("_cl")).as("_num"))
        .withColumn("lag", lit(k))
    }.reduce(_ unionByName _)
    lags.join(broadcast(denom), Seq(SeriesId))
      .select(col(SeriesId), col("lag"), (col("_num") / col("_d")).as("acf"))
  }

  /** PACF via Durbin-Levinson over the ACF values — per-series driver math
    * on maxLag numbers, after one distributed ACF pass. */
  def pacf(df: DataFrame, maxLag: Int): Seq[(String, Int, Double)] = {
    val r = acf(df, maxLag).collect()
      .groupBy(_.getString(0))
      .map { case (sid, rows) =>
        sid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
      }
    r.toSeq.flatMap { case (sid, rho) =>
      val p = durbinLevinson(rho)
      p.zipWithIndex.map { case (v, i) => (sid, i + 1, v) }
    }
  }

  private[functions] def durbinLevinson(rho: Array[Double]): Array[Double] = {
    val m = rho.length
    val phi = Array.ofDim[Double](m + 1, m + 1)
    val pacf = Array.ofDim[Double](m)
    for (k <- 1 to m) {
      if (k == 1) phi(1)(1) = rho(0)
      else {
        val num = rho(k - 1) - (1 until k).map(j => phi(k - 1)(j) * rho(k - 1 - j)).sum
        val den = 1.0 - (1 until k).map(j => phi(k - 1)(j) * rho(j - 1)).sum
        phi(k)(k) = num / den
        for (j <- 1 until k) phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
      }
      pacf(k - 1) = phi(k)(k)
    }
    pacf
  }

  /** Augmented Dickey-Fuller test (constant, no trend):
    * Δy_t = α + γ·y_(t−1) + Σ_(i=1..p) β_i·Δy_(t−i) + ε. Returns the γ
    * t-statistic per series; compare against MacKinnon 5% critical value
    * ≈ −2.86 (reject unit root ⇒ stationary)
    * (/root/reference/src/scalecast/Forecaster.py:1258-1301). The OLS runs
    * on the driver per series (regressor count ≤ p+2, closed-form normal
    * equations); the lag matrix build is distributed. */
  def adfT(df: DataFrame, p: Int = 1): Seq[(String, Double)] = {
    val obs = df.filter(!col(IsFuture))
      .withColumn("_dy", col(Y) - lag(col(Y), 1).over(w))
      .withColumn("_ylag", lag(col(Y), 1).over(w))
    val withLags = (1 to p).foldLeft(obs)((f, i) =>
      f.withColumn(s"_dy$i", lag(col("_dy"), i).over(w)))
    val cols = Seq("_dy", "_ylag") ++ (1 to p).map(i => s"_dy$i")
    val complete = cols.foldLeft(withLags)((f, c) => f.filter(col(c).isNotNull))
    complete.select(col(SeriesId), col("_dy"), col("_ylag"),
        array((1 to p).map(i => col(s"_dy$i")): _*).as("_dls"))
      .collect()
      .groupBy(_.getString(0))
      .toSeq.map { case (sid, rows) =>
        val ys = rows.map(_.getDouble(1))
        val xs = rows.map(r => Array(1.0, r.getDouble(2)) ++ r.getSeq[Double](3))
        sid -> tStatOfSecondCoef(xs, ys)
      }
  }

  /** OLS t-stat of coefficient index 1 (the y_(t−1) term) via normal
    * equations + residual variance — plain Gaussian elimination, k ≤ 4. */
  private def tStatOfSecondCoef(x: Array[Array[Double]], y: Array[Double]): Double = {
    val n = x.length; val k = x(0).length
    val xtx = Array.tabulate(k, k)((i, j) => x.map(r => r(i) * r(j)).sum)
    val xty = Array.tabulate(k)(i => x.zip(y).map { case (r, v) => r(i) * v }.sum)
    val a = xtx.map(_.clone); val b = xty.clone
    // gaussian elimination with partial pivoting, also building the inverse
    val inv = Array.tabulate(k, k)((i, j) => if (i == j) 1.0 else 0.0)
    for (c <- 0 until k) {
      val piv = (c until k).maxBy(r => math.abs(a(r)(c)))
      val t = a(c); a(c) = a(piv); a(piv) = t
      val ti = inv(c); inv(c) = inv(piv); inv(piv) = ti
      val tb = b(c); b(c) = b(piv); b(piv) = tb
      val d = a(c)(c)
      for (j <- 0 until k) { a(c)(j) /= d; inv(c)(j) /= d }
      b(c) /= d
      for (r <- 0 until k if r != c) {
        val f = a(r)(c)
        for (j <- 0 until k) { a(r)(j) -= f * a(c)(j); inv(r)(j) -= f * inv(c)(j) }
        b(r) -= f * b(c)
      }
    }
    val beta = b
    val resid = x.zip(y).map { case (r, v) => v - r.zip(beta).map(p => p._1 * p._2).sum }
    val sigma2 = resid.map(e => e * e).sum / (n - k)
    val se = math.sqrt(sigma2 * inv(1)(1))
    beta(1) / se
  }

  /** Skewness/kurtosis-based normality check on a column (the
    * D'Agostino-Pearson ingredients; Forecaster.py:1304-1318) — distributed
    * moments, returning (series, skew, kurtosis, n). */
  def momentsForNormality(df: DataFrame): DataFrame =
    df.filter(!col(IsFuture)).groupBy(SeriesId)
      .agg(skewness(col(Y)).as("skewness"), kurtosis(col(Y)).as("kurtosis"),
        count(lit(1)).as("n"))

  /** `corr_lags` — Pearson correlation of one series with the k-lagged other
    * (/root/reference/src/scalecast/MVForecaster.py:1012-1074). */
  def corrLags(df: DataFrame, sidA: String, sidB: String, maxLag: Int): DataFrame = {
    val a = df.filter(col(SeriesId) === sidA).select(col(Ds), col(Y).as("ya"))
    val b = df.filter(col(SeriesId) === sidB).select(col(Ds), col(Y).as("yb"))
    (0 to maxLag).map { k =>
      val bl = b.withColumn("yb", lag(col("yb"), k).over(Window.orderBy(Ds)))
      a.join(bl, Seq(Ds.toString)).filter(col("yb").isNotNull)
        .agg(corr(col("ya"), col("yb")).as("corr"))
        .withColumn("lag", lit(k))
        .select(lit(sidA).as("sid_a"), lit(sidB).as("sid_b"), col("lag"), col("corr"))
    }.reduce(_ unionByName _)
  }
}
