package graft.eval

import graft.core.SeriesFrame._
import graft.functions.Metrics
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation schemes: temporal test split, rolling-origin cross-validation,
  * and backtesting (SURVEY §2.7). MLlib's CrossValidator splits randomly and
  * would leak future into past — these splitters are strictly temporal:
  * every fold's train rows precede its validation rows
  * (/root/reference/src/scalecast/_Forecaster_parent.py:1693-1867 and
  * Pipeline.py:229-359).
  *
  * A "model function" is `scoredFrame: DataFrame => DataFrame` — it receives
  * the frame with `is_test` flags and must return it with a `yhat` column,
  * fitting only on non-test rows. Fold/iteration fan-out is a driver loop of
  * independent Spark jobs (parallelizable via scheduler pools); each job is
  * itself fully distributed across series.
  */
object Evaluation {

  type ModelFn = DataFrame => DataFrame

  /** Rolling-origin CV: fold i (0-based) drops the last i·h observed rows,
    * then holds out the final h as the validation slice. Returns one row per
    * (series, fold) with the requested metric aggregates over the slice. */
  def rollingOriginCV(frame: DataFrame, k: Int, h: Int, modelFn: ModelFn,
                      metricNames: Seq[String] = Seq("rmse", "mae")): DataFrame = {
    val folds = (0 until k).map { i =>
      val chopped = if (i == 0) frame.filter(!col(IsFuture)) else chopFromFront(frame, i * h)
      val flagged = withTestFlag(chopped, h)
      val scored = modelFn(flagged)
      metricsOverTest(scored, metricNames).withColumn("fold", lit(i))
    }
    folds.reduce(_ unionByName _)
  }

  /** Backtest: iteration i truncates the series by (h + i·jumpBack) rows,
    * forecasts h, and scores against the held-out actuals
    * (Pipeline.py:229-359, util.py:112-230 backtest_metrics). */
  def backtest(frame: DataFrame, nIter: Int, h: Int, jumpBack: Int,
               modelFn: ModelFn,
               metricNames: Seq[String] = Seq("rmse", "mae")): DataFrame = {
    val iters = (0 until nIter).map { i =>
      val chopped = if (i == 0) frame.filter(!col(IsFuture))
                    else chopFromFront(frame, i * jumpBack)
      val flagged = withTestFlag(chopped, h)
      val scored = modelFn(flagged)
      metricsOverTest(scored, metricNames).withColumn("iter", lit(i))
    }
    iters.reduce(_ unionByName _)
  }

  /** Metric aggregates over the `is_test` slice, one row per series. */
  def metricsOverTest(scored: DataFrame, metricNames: Seq[String]): DataFrame = {
    val t = scored.filter(col("is_test") && col("yhat").isNotNull && !isnan(col("yhat")))
    val aggs = metricNames.map(n => Metrics.registry(n)(col(Y), col("yhat")).as(n))
    t.groupBy(SeriesId).agg(aggs.head, aggs.tail: _*)
  }

  /** `export_validation_grid`
    * (/root/reference/src/scalecast/_Forecaster_parent.py:1545-1567): the
    * scored grid as a DataFrame (one row per hyperparameter combination). */
  def gridToDataFrame(spark: org.apache.spark.sql.SparkSession,
                      scored: Seq[(Map[String, Double], Double)],
                      metricName: String = "rmse"): DataFrame = {
    import spark.implicits._
    val keys = scored.flatMap(_._1.keys).distinct.sorted
    val rows = scored.map { case (params, v) =>
      (keys.map(k => params.getOrElse(k, Double.NaN)), v)
    }
    val base = rows.map { case (ps, v) => (ps.mkString(","), v) }
      .toDF("params", metricName)
    base
  }

  /** Grid search: evaluate `fitWith(params)` over the grid on the validation
    * slice (rolling CV with k folds), rank by mean metric. Returns the scored
    * grid, best first. Driver loop — each cell is an independent Spark job;
    * at scale submit with a thread pool over FAIR scheduler pools. */
  def gridSearch(frame: DataFrame, grid: Seq[Map[String, Double]],
                 fitWith: Map[String, Double] => ModelFn,
                 k: Int, h: Int, metricName: String = "rmse"): Seq[(Map[String, Double], Double)] = {
    val lower = Metrics.lowerIsBetter(metricName)
    val scored = grid.map { params =>
      val cv = rollingOriginCV(frame, k, h, fitWith(params), Seq(metricName))
      val meanMetric = cv.agg(avg(col(metricName))).first().getDouble(0)
      (params, meanMetric)
    }
    scored.sortBy(s => if (lower) s._2 else -s._2)
  }
}
