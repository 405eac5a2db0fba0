package graft.eval

import graft.core.SeriesFrame._
import graft.functions.FeatureOps
import graft.models.{Baselines, MllibTsEstimator, Recursive}
import graft.operators.{FittedTransform, Transforms, TransformStack}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Automatic specification search (SURVEY §2.8) — driver-side search loops
  * where each candidate evaluation is one distributed job:
  *
  *  - [[autoXvarSelect]] ⇒ `auto_Xvar_select`
  *    (/root/reference/src/scalecast/Forecaster.py:658-1163): staged search
  *    for the best trend representation, seasonal depth, then AR order,
  *    scored by validation RMSE of an OLS model on the candidate features;
  *  - [[bestSeriesLength]] ⇒ `determine_best_series_length`
  *    (Forecaster.py:1178-1256);
  *  - [[findOptimalTransformation]] ⇒ `find_optimal_transformation`
  *    (/root/reference/src/scalecast/util.py:575-896): greedy forward
  *    selection over a fixed try-order of transformations, each candidate
  *    scored by a mini-backtest with an AR-only estimator, kept only if it
  *    improves the metric.
  */
object AutoSelect {

  /** Validation RMSE of an OLS fit on the given feature columns: holds out
    * the last h observed rows, vectorized (non-dynamic) prediction. */
  def scoreFeatures(frame: DataFrame, features: Seq[String], h: Int): Double = {
    if (features.isEmpty) return Double.NaN
    val flagged = withTestFlag(frame, h)
    val model = MllibTsEstimator("mlr", features).fit(flagged)
    val scored = model.transform(flagged)
    Evaluation.metricsOverTest(scored, Seq("rmse"))
      .agg(avg("rmse")).first().getDouble(0)
  }

  final case class XvarSelection(trend: Seq[String], seasonal: Seq[String],
                                 arOrder: Int, rmse: Double) {
    def features: Seq[String] = trend ++ seasonal ++ (1 to arOrder).map(i => s"ar_$i")
  }

  /** Staged search: trend rep → seasonal rep → AR order (greedy like the
    * reference; each stage keeps its winner fixed). */
  def autoXvarSelect(frame: DataFrame, maxAr: Int = 12, h: Int = 12): XvarSelection = {
    val base0 = FeatureOps.addTimeTrend(frame.filter(!col(IsFuture)))
    val base1 = base0.withColumn("t2", col("t") * col("t"))
    val base2 = FeatureOps.addFourier(
      FeatureOps.addCalendar(base1, Seq("month")), col("month"), 12.0, "month")
    val withAr = FeatureOps.addArTerms(base2, maxAr).cache()

    val trendCands = Seq(Seq.empty[String], Seq("t"), Seq("t", "t2"))
    val bestTrend = trendCands.minBy(tc => nanSafe(scoreFeatures(withAr, tc, h)))
    val seasCands = Seq(Seq.empty[String], Seq("monthsin", "monthcos"))
    val bestSeas = seasCands.minBy(sc => nanSafe(scoreFeatures(withAr, bestTrend ++ sc, h)))
    val arCands = 0 to maxAr
    val bestAr = arCands.minBy(a =>
      nanSafe(scoreFeatures(withAr, bestTrend ++ bestSeas ++ (1 to a).map(i => s"ar_$i"), h)))
    val finalScore = scoreFeatures(withAr,
      bestTrend ++ bestSeas ++ (1 to bestAr).map(i => s"ar_$i"), h)
    XvarSelection(bestTrend, bestSeas, bestAr, finalScore)
  }

  private def nanSafe(d: Double): Double = if (d.isNaN) Double.MaxValue else d

  /** Try keeping only the last L observations for each candidate L; return
    * (bestLength, rmse) under the given model function. */
  def bestSeriesLength(frame: DataFrame, candidates: Seq[Int], h: Int,
                       modelFn: Evaluation.ModelFn): (Int, Double) = {
    val scored = candidates.map { len =>
      val kept = keepSmallerHistory(frame, len)
      val flagged = withTestFlag(kept, h)
      val rmse = Evaluation.metricsOverTest(modelFn(flagged), Seq("rmse"))
        .agg(avg("rmse")).first().getDouble(0)
      (len, rmse)
    }
    scored.minBy(s => nanSafe(s._2))
  }

  /** Candidate transformations in the reference's try-order
    * (util.py:575-896): detrend, deseason, log, diff(1), diff(m), scale.
    * Each is kept only if the AR(4)-OLS validation RMSE improves. Returns the
    * accepted stack and the transformed frame. */
  def findOptimalTransformation(frame: DataFrame, m: Int = 12, h: Int = 12)
      : (TransformStack, DataFrame, Double) = {
    def score(df: DataFrame): Double = {
      val withAr = FeatureOps.addArTerms(df.filter(!col(IsFuture)), 4)
      scoreFeatures(withAr, (1 to 4).map(i => s"ar_$i"), h)
    }
    val candidates: Seq[(String, DataFrame => FittedTransform)] = Seq(
      "detrend"  -> ((df: DataFrame) => Transforms.detrendLinearT(df)),
      "deseason" -> ((df: DataFrame) => Transforms.deseasonT(df, m)),
      "diff1"    -> ((df: DataFrame) => Transforms.diffT(df, 1)),
      s"diff$m"  -> ((df: DataFrame) => Transforms.diffT(df, m)),
      "scale"    -> ((df: DataFrame) => Transforms.scaleT(df))
    )
    var cur = frame
    var curScore = score(frame)
    var accepted = List.empty[FittedTransform]
    candidates.foreach { case (_, mk) =>
      val t = mk(cur)
      val candidate = t.transform(cur)
      val s = score(candidate.filter(col(Y).isNotNull))
      if (!s.isNaN && s < curScore) {
        cur = candidate.filter(col(Y).isNotNull)
        curScore = s
        accepted = t :: accepted
      }
    }
    (TransformStack(accepted.reverse), cur, curScore)
  }
}
