package graft.models

import graft.core.SeriesFrame._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Per-series exact OLS at ANY series count — the grouped twin of [[Ols]]:
  * the k(k+1)/2 + k normal-equation moments come from ONE aggregation
  * grouped by series_id, and the (k+1)×(k+1) solves map over the per-series
  * stats rows on the executors (the [[graft.functions.Diagnostics.adfT]]
  * pattern) — no observation, moment, or fit ever reaches the driver. This
  * is what per-series search decisions (the §2.8 meta-ops applied to 10⁶
  * series in one frame) fit with.
  *
  * Train slice matches [[Ols.fit]]: observed, non-test, y and all features
  * non-null. A series whose normal equations are singular solves to
  * non-finite βs; downstream scorers surface that as NaN and per-series
  * deciders skip it (the reference's failed-combo policy, per series).
  */
object GroupedOls {

  /** One β row per series: (series_id, beta array[k+1]), intercept at
    * index 0 — [[Ols.Fit]]'s layout. */
  def fitBySeries(frame: DataFrame, feats: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType, StructField, StructType}
    val hasTest = frame.columns.contains("is_test")
    val obs = frame.filter(!col(IsFuture) && col(Y).isNotNull)
    val train0 = if (hasTest) obs.filter(!col("is_test")) else obs
    val train = feats.foldLeft(train0)((f, c) => f.filter(col(c).isNotNull))
    val xs: Seq[Column] = lit(1.0) +: feats.map(c => col(c).cast("double"))
    val k = xs.size
    val aggs = (for (i <- 0 until k; j <- 0 to i) yield
      sum(xs(i) * xs(j)).as(s"sa_${i}_$j")) ++
      (0 until k).map(i => sum(xs(i) * col(Y).cast("double")).as(s"sb_$i"))
    val outSchema = StructType(Seq(StructField(SeriesId, StringType),
      StructField("beta", ArrayType(DoubleType, containsNull = false))))
    train.groupBy(SeriesId).agg(aggs.head, aggs.tail: _*)
      .map({ r =>
        val a = Array.tabulate(k, k)((i, j) =>
          r.getDouble(r.fieldIndex(s"sa_${math.max(i, j)}_${math.min(i, j)}")))
        val b = Array.tabulate(k)(i => r.getDouble(r.fieldIndex(s"sb_$i")))
        Row(r.getString(r.fieldIndex(SeriesId)), solve(a, b).toSeq)
      })(Encoders.row(outSchema)).toDF()
  }

  /** The prediction expression over a frame that has the per-series `beta`
    * array joined in: β₀ + Σ βᵢ·featᵢ (null features → null yhat). */
  def predictExpr(feats: Seq[String]): Column =
    feats.zipWithIndex.foldLeft(element_at(col("beta"), 1)) {
      case (acc, (c, i)) => acc + col(c).cast("double") * element_at(col("beta"), i + 2)
    }

  /** Per-series fit + vectorized score in the common by-series output shape
    * (series_id, ds, yhat) — [[graft.models.Svr.fitPredictBySeries]]'s
    * contract for the closed-form family. Conformal bounds attach via
    * [[graft.operators.Conformal.attachBySeries]] (the reference's CI
    * contract at any series count). */
  def fitPredictBySeries(frame: DataFrame, feats: Seq[String]): DataFrame =
    frame.join(fitBySeries(frame, feats), Seq(SeriesId), "left")
      .withColumn("yhat", predictExpr(feats))
      .select(col(SeriesId), col(Ds), col("yhat"))

  /** Per-series validation RMSE of the per-series OLS — the grouped
    * [[graft.eval.AutoSelect.scoreFeatures]]: last-h holdout per series,
    * vectorized prediction, one metrics row per series. A series whose fit
    * is singular or whose holdout is empty simply has no row / a NaN —
    * per-series deciders treat that as "skip". */
  def scoreFeaturesBySeries(frame: DataFrame, feats: Seq[String], h: Int): DataFrame = {
    val flagged = withTestFlag(frame, h)
    val fits = fitBySeries(flagged, feats)
    val scored = flagged.join(fits, Seq(SeriesId), "left")
      .withColumn("yhat", predictExpr(feats))
    graft.eval.Evaluation.metricsOverTest(scored, Seq("rmse"))
  }

  /** [[solve]] for callers outside the models package — the SQL aggregate
    * [[graft.functions.OlsFit]] shares the exact executor-side kernel. */
  def sqlSolve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = solve(a, b)

  /** Gaussian elimination with partial pivoting — the executor-side solver
    * shared by every grouped closed-form fit (here and [[BlockedVar]]). */
  private[models] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val k = b0.length
    val a = a0.map(_.clone); val b = b0.clone
    for (c <- 0 until k) {
      val piv = (c until k).maxBy(r => math.abs(a(r)(c)))
      val t = a(c); a(c) = a(piv); a(piv) = t
      val tb = b(c); b(c) = b(piv); b(piv) = tb
      val d = a(c)(c)
      for (j <- 0 until k) a(c)(j) /= d
      b(c) /= d
      for (r <- 0 until k if r != c) {
        val f = a(r)(c)
        for (j <- 0 until k) a(r)(j) -= f * a(c)(j)
        b(r) -= f * b(c)
      }
    }
    b
  }
}
