package graft.models

import graft.core.SeriesFrame._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unrestricted VECM — the reference's `vecm` estimator
  * (/root/reference/src/scalecast/models.py:422-559, statsmodels VECM)
  * estimated per equation by OLS instead of Johansen's reduced-rank MLE:
  *
  *   Δy_s(t) = c + Π_s·y(t−1) + Σ_(i=1..k) Γ_si·Δy(t−i) + ε
  *
  * Each series' equation regresses its difference on the lagged LEVELS of
  * all series (the error-correction term, unrestricted Π) plus lagged
  * differences of all series. Estimation is the same distributed OLS used
  * everywhere; the rank restriction is deliberately dropped (documented
  * deviation — Johansen's eigen step is driver-side math on a k×k matrix and
  * can be layered on later without changing this plumbing).
  */
object Vecm {

  def levelCol(sid: String): String = s"lvl_${sid}_1"
  def dlagCol(sid: String, k: Int): String = s"dlag_${sid}_$k"

  /** Build Δy target + lagged-level and lagged-difference features. */
  def prepare(frame: DataFrame, seriesIds: Seq[String], diffLags: Int): DataFrame = {
    val withD = frame.withColumn("_dy", col(Y) - lag(col(Y), 1).over(w))
    // wide frames: one row per date (driver-sized calendar)
    val ww = org.apache.spark.sql.expressions.Window.orderBy(Ds)
    val wideL = withD.groupBy(Ds).pivot(SeriesId, seriesIds).agg(first(Y))
    val wideD = withD.groupBy(Ds).pivot(SeriesId, seriesIds).agg(first("_dy"))
    val levels = seriesIds.foldLeft(wideL)((f, sid) =>
      f.withColumn(levelCol(sid), lag(col(sid), 1).over(ww)))
      .select((Ds +: seriesIds.map(levelCol)).map(col): _*)
    val dlags = seriesIds.foldLeft(wideD)((f, sid) =>
      (1 to diffLags).foldLeft(f)((g, k) =>
        g.withColumn(dlagCol(sid, k), lag(col(sid), k).over(ww))))
      .select((Ds +: (for (s <- seriesIds; k <- 1 to diffLags) yield dlagCol(s, k))).map(col): _*)
    withD.join(levels, Seq(Ds), "left").join(dlags, Seq(Ds), "left")
  }

  /** Fit one Δ-equation per series; returns scored frame with `yhat` =
    * y(t−1) + Δŷ(t) (one-step-ahead level prediction). */
  def fitPredict(frame: DataFrame, seriesIds: Seq[String], diffLags: Int = 1): DataFrame = {
    val prep = prepare(frame, seriesIds, diffLags).localCheckpoint(true)
    val feats = seriesIds.map(levelCol) ++
      (for (s <- seriesIds; k <- 1 to diffLags) yield dlagCol(s, k))
    val scored = seriesIds.map { sid =>
      val mine = prep.filter(col(SeriesId) === sid)
      // fit on Δy as the label
      val train = feats.foldLeft(
        mine.filter(!col(IsFuture) && col("_dy").isNotNull))((f, c) => f.filter(col(c).isNotNull))
      val est = MllibTsEstimator("mlr", feats)
      val model = est.pipeline().fit(train.withColumnRenamed(Y, "_ylvl").withColumnRenamed("_dy", Y))
      model.transform(mine.withColumnRenamed(Y, "_ylvl").withColumnRenamed("_dy", Y))
        .withColumnRenamed(Y, "_dy").withColumnRenamed("_ylvl", Y)
        .withColumn("yhat",
          when(isnan(col("yhat")), lit(null)).otherwise(col(Y) - col("_dy") + col("yhat")))
    }
    scored.reduce(_ unionByName _).drop("_fraw", "_f")
  }
}
