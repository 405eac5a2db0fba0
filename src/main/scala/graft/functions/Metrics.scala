package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's 10 forecast-accuracy metrics as Spark Column aggregations
  * (/root/reference/src/scalecast/Metrics.py:12-246, registry cfg.py:56-65).
  * Each takes (actual, forecast) columns and yields one aggregate Column, so
  * a single `groupBy(model, series_id).agg(all metrics)` scores every model
  * and series in one shuffle — the scale-out shape for 10^6 series.
  */
object Metrics {

  /** Σ(f−a) (Metrics.py:13-31). */
  def bias(a: Column, f: Column): Column = sum(f - a)

  /** |Σ(f−a)| (Metrics.py:33-51). */
  def abias(a: Column, f: Column): Column = abs(sum(f - a))

  /** mean |f−a|/|a|; NULL if any a == 0 (reference yields NaN, Metrics.py:53-72).
    * The division is guarded per-row — ANSI mode (Spark 4 default) raises on
    * divide-by-zero even inside a dead aggregate branch. */
  def mape(a: Column, f: Column): Column =
    when(max(when(a === 0, 1).otherwise(0)) === 1, lit(null).cast("double"))
      .otherwise(avg(when(a =!= 0, abs((f - a) / a))))

  /** 1 − SSE/SST (Metrics.py:75-91). SST uses the single-pass identity
    * Σa² − (Σa)²/n so the whole metric is one aggregation. */
  def r2(a: Column, f: Column): Column = {
    val sse = sum(pow(f - a, 2))
    val sst = sum(pow(a, 2)) - pow(sum(a), 2) / count(a)
    lit(1) - sse / sst
  }

  def mse(a: Column, f: Column): Column  = avg(pow(f - a, 2))
  def rmse(a: Column, f: Column): Column = sqrt(avg(pow(f - a, 2)))
  def mae(a: Column, f: Column): Column  = avg(abs(f - a))

  /** M4 sMAPE: mean 2|f−a|/(|a|+|f|) (Metrics.py:147-175). */
  def smape(a: Column, f: Column): Column = avg(lit(2) * abs(f - a) / (abs(a) + abs(f)))

  /** MASE numerator term: MAE(a, f). Denominator (mean |m-step diff| of the
    * TRAINING observations, Metrics.py:177-206) must be aggregated on the
    * train slice and joined/divided by the caller — two-stage by definition. */
  def maseNumerator(a: Column, f: Column): Column = mae(a, f)

  /** MSIS numerator: mean interval score of (upper, lower) at level alpha
    * (Metrics.py:208-246). Scaled by the same seasonal-diff denominator as
    * MASE by the caller. */
  def msisNumerator(a: Column, uf: Column, lf: Column, alpha: Double): Column =
    avg(
      (uf - lf)
        + when(a < lf, (lf - a) * (2.0 / alpha)).otherwise(0.0)
        + when(a > uf, (a - uf) * (2.0 / alpha)).otherwise(0.0)
    )

  /** Mean absolute m-step difference — the M4 scaling denominator, aggregated
    * over the training slice: avg(|y − lag(y, m)|). The lag must be computed
    * by the caller (window op), this is just the final aggregate. */
  def scaleDenominator(diffAbs: Column): Column = avg(diffAbs)

  private val builtin: Map[String, (Column, Column) => Column] = Map(
    "bias"  -> bias _,
    "abias" -> abias _,
    "mape"  -> mape _,
    "r2"    -> r2 _,
    "mse"   -> mse _,
    "rmse"  -> rmse _,
    "mae"   -> mae _,
    "smape" -> smape _
  )

  private val builtinLower: Map[String, Boolean] = Map(
    "bias" -> true, "abias" -> true, "mape" -> true, "r2" -> false,
    "mse" -> true, "rmse" -> true, "mae" -> true, "smape" -> true,
    "mase" -> true, "msis" -> true
  )

  /** User-registered metrics (`set_metrics` / MetricStore,
    * /root/reference/src/scalecast/_Forecaster_parent.py:1133-1164,
    * classes.py:25-46): an aggregate over (actual, forecast) columns plus
    * its ranking direction. Registered names join [[registry]] everywhere
    * metrics are evaluated (model summaries, CV scoring, ordering). */
  private val custom =
    scala.collection.concurrent.TrieMap.empty[String, ((Column, Column) => Column, Boolean)]

  def register(name: String, fn: (Column, Column) => Column,
               lowerBetter: Boolean = true): Unit = {
    require(!builtin.contains(name), s"metric '$name' is builtin")
    custom.put(name, (fn, lowerBetter))
  }

  /** Registry parity with cfg.py:56-65 (note: the reference maps 'bias' and
    * 'abias' at cfg.py:62-63 onto smape by bug; we register them correctly),
    * plus any user-registered metrics. */
  def registry: Map[String, (Column, Column) => Column] =
    builtin ++ custom.view.mapValues(_._1).toMap

  /** Which direction is better, per metric (classes.py:48-77 ordering). */
  def lowerIsBetter: Map[String, Boolean] =
    builtinLower ++ custom.view.mapValues(_._2).toMap
}
