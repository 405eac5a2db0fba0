package graft.eval

import graft.core.SeriesFrame._
import graft.operators.{FittedTransform, TransformStack}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Transformer → forecast → Reverter pipeline
  * (/root/reference/src/scalecast/Pipeline.py:70-214, 437-462): apply a
  * transform stack, run one or more model functions on the transformed
  * frame, then revert y AND every prediction column back to level so
  * metrics/exports read in original units (the reference's signature
  * transform→model→revert round trip, SeriesTransformer.py:90-119).
  */
object TsPipeline {

  final case class Scored(frame: DataFrame, yhatCols: Seq[String])

  /** fit_predict: transforms are FITTED on the incoming frame in order, the
    * model function runs in transformed space, and the full stack reverts
    * the result (y and prediction columns together). */
  def fitPredict(frame: DataFrame,
                 mkTransforms: Seq[DataFrame => FittedTransform],
                 modelFn: DataFrame => DataFrame,
                 yhatCols: Seq[String] = Seq("yhat")): DataFrame = {
    var cur = frame
    var fitted = List.empty[FittedTransform]
    mkTransforms.foreach { mk =>
      val t = mk(cur)
      cur = t.transform(cur)
      fitted = t :: fitted
    }
    val scored = modelFn(cur)
    TransformStack(fitted.reverse).revert(scored, Y +: yhatCols)
  }

  /** Pipeline backtest (Pipeline.py:229-359): n_iter re-runs of the whole
    * fit_predict, iteration i truncating (h + i·jumpBack) trailing rows; the
    * scored frames (in ORIGINAL units) are returned for metric tables or
    * dynamic-interval estimation. */
  def backtest(frame: DataFrame, nIter: Int, h: Int, jumpBack: Int,
               mkTransforms: Seq[DataFrame => FittedTransform],
               modelFn: DataFrame => DataFrame,
               parallelism: Int = 1): Seq[DataFrame] =
    Evaluation.fanOut(0 until nIter, parallelism) { i =>
      val chopped = if (i == 0) frame.filter(!col(IsFuture))
                    else chopFromFront(frame, i * jumpBack)
      val flagged = withTestFlag(chopped, h)
      fitPredict(flagged, mkTransforms, modelFn)
    }
}
