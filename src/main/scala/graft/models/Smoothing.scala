package graft.models

import graft.core.SeriesFrame._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequential smoothing recursions (SES, Holt, Holt-Winters) — the
  * reference's `hwes` estimator family
  * (/root/reference/src/scalecast/models.py:970-1059, statsmodels
  * ExponentialSmoothing).
  *
  * These are inherently O(n)-sequential per series, so they run inside
  * `groupByKey(series).flatMapGroups`: each series' rows are sorted and
  * folded in executor memory (a series is 10²–10⁴ points — trivially fits),
  * while distinct series parallelize across the cluster. This is the
  * mapGroups escape hatch SURVEY §4 reserves for genuine recursions.
  */
object Smoothing {

  final case class SPoint(series_id: String, ds: java.sql.Date,
                          y: Option[Double], is_future: Boolean)
  final case class SPred(series_id: String, ds: java.sql.Date,
                         y: Option[Double], is_future: Boolean, yhat: Option[Double])

  private def toPoints(df: DataFrame): org.apache.spark.sql.Dataset[SPoint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(SeriesId).cast("string"), col(Ds).cast("date"),
      col(Y).cast("double"), col(IsFuture).cast("boolean")).as[SPoint]
  }

  /** Simple exponential smoothing, one-step-ahead fitted values:
    * l_1 = y_1; yhat_t = l_(t-1); l_t = α·y_t + (1−α)·l_(t-1);
    * horizon forecast is flat at l_T. */
  def ses(df: DataFrame, alpha: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    toPoints(df).groupByKey(_.series_id).flatMapGroups { (_, it) =>
      val rows = it.toIndexedSeq.sortBy(_.ds.getTime)
      var level = Double.NaN
      rows.map { r =>
        if (!r.is_future && r.y.isDefined) {
          val yhat = if (level.isNaN) None else Some(level)
          level = if (level.isNaN) r.y.get else alpha * r.y.get + (1 - alpha) * level
          SPred(r.series_id, r.ds, r.y, r.is_future, yhat)
        } else {
          SPred(r.series_id, r.ds, r.y, r.is_future,
            if (level.isNaN) None else Some(level))
        }
      }
    }.toDF()
  }

  /** Additive Holt-Winters: level/trend/seasonal recursions with the
    * classical initialization (level = mean of first cycle, trend = mean
    * cycle-over-cycle step, seasonal = first-cycle deviations). */
  def holtWinters(df: DataFrame, alpha: Double, beta: Double, gamma: Double,
                  m: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    toPoints(df).groupByKey(_.series_id).flatMapGroups { (_, it) =>
      val rows = it.toIndexedSeq.sortBy(_.ds.getTime)
      val obs = rows.filter(r => !r.is_future && r.y.isDefined).map(_.y.get)
      if (obs.length < 2 * m) {
        rows.map(r => SPred(r.series_id, r.ds, r.y, r.is_future, None))
      } else {
        val c1 = obs.slice(0, m); val c2 = obs.slice(m, 2 * m)
        var level = c1.sum / m
        var trend = (c2.sum / m - c1.sum / m) / m
        val seas = Array.tabulate(m)(i => c1(i) - c1.sum / m)
        var ti = 0
        rows.map { r =>
          if (!r.is_future && r.y.isDefined) {
            val si = ti % m
            val yhat = level + trend + seas(si)
            val yv = r.y.get
            val newLevel = alpha * (yv - seas(si)) + (1 - alpha) * (level + trend)
            trend = beta * (newLevel - level) + (1 - beta) * trend
            seas(si) = gamma * (yv - newLevel) + (1 - gamma) * seas(si)
            level = newLevel
            ti += 1
            SPred(r.series_id, r.ds, r.y, r.is_future, Some(yhat))
          } else {
            // horizon step k ahead: level + k·trend + seasonal
            ti += 1
            val k = ti - obs.length
            val si = (ti - 1) % m
            SPred(r.series_id, r.ds, r.y, r.is_future,
              Some(level + k * trend + seas(si)))
          }
        }
      }
    }.toDF()
  }

  /** Brute-force parameter search over (α, β, γ) minimizing in-sample SSE —
    * mirrors statsmodels' optimized=True spirit with a coarse grid. Driver
    * picks the best scored combination; each combination is one Spark job. */
  def holtWintersGridSearch(df: DataFrame, m: Int,
                            grid: Seq[(Double, Double, Double)],
                            parallelism: Int = 1): ((Double, Double, Double), Double) = {
    val scored = graft.eval.Evaluation.fanOut(grid, parallelism) { case (a, b, g) =>
      val sse = holtWinters(df, a, b, g, m)
        .filter(!col(IsFuture) && col("yhat").isNotNull)
        .agg(sum(pow(col(Y) - col("yhat"), 2)).as("sse"))
        .first().getDouble(0)
      ((a, b, g), sse)
    }
    scored.minBy(_._2)
  }
}
