package graft.operators

import graft.core.Joins.maybeBroadcast
import graft.core.SeriesFrame._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value handling — the reference's `Forecaster_with_missing_vals`
  * (/root/reference/src/scalecast/util.py:898-1155): regularize a series to a
  * target frequency by inserting a date spine, then fill values by strategy.
  * All strategies are window expressions over (series_id, ds) — one pass, no
  * driver loops, valid for millions of series.
  */
object Imputer {

  /** Insert missing daily rows per series via a date spine
    * (sequence + explode + left join; util.py:997-1007). */
  def withDailySpine(df: DataFrame): DataFrame = {
    val bounds = df.groupBy(SeriesId).agg(min(Ds).as("d0"), max(Ds).as("d1"))
    val spine = bounds.select(col(SeriesId),
      explode(expr("sequence(d0, d1, interval 1 day)")).as(Ds))
    spine.join(df, Seq(SeriesId, Ds), "left")
  }

  /** Monthly variant of the spine. */
  def withMonthlySpine(df: DataFrame): DataFrame = {
    val bounds = df.groupBy(SeriesId).agg(min(Ds).as("d0"), max(Ds).as("d1"))
    val spine = bounds.select(col(SeriesId),
      explode(expr("sequence(d0, d1, interval 1 month)")).as(Ds))
    spine.join(df, Seq(SeriesId, Ds), "left")
  }

  private def prevNonNull(c: Column): Column =
    last(c, ignoreNulls = true).over(w.rowsBetween(Window.unboundedPreceding, -1))
  private def nextNonNull(c: Column): Column =
    first(c, ignoreNulls = true).over(w.rowsBetween(1, Window.unboundedFollowing))

  /** Forward fill (util.py `fill_strategy='ffill'`). */
  def ffill(df: DataFrame, valueCol: String = Y): DataFrame =
    df.withColumn(valueCol, coalesce(col(valueCol),
      last(col(valueCol), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))))

  /** Backward fill. */
  def bfill(df: DataFrame, valueCol: String = Y): DataFrame =
    df.withColumn(valueCol, coalesce(col(valueCol),
      first(col(valueCol), ignoreNulls = true)
        .over(w.rowsBetween(0, Window.unboundedFollowing))))

  /** Constant fill. */
  def staticFill(df: DataFrame, value: Double, valueCol: String = Y): DataFrame =
    df.withColumn(valueCol, coalesce(col(valueCol), lit(value)))

  /** Linear interpolation between the nearest non-null neighbors, weighted by
    * ROW position (y = mx + b between anchors; util.py:1051-1074 — pandas
    * interpolate is positional, so [1, 2, ·, 4] fills 3.0 regardless of date
    * spacing; on a regular spine positional == time-weighted). Endpoints with
    * no anchor on one side stay null (combine with ffill/bfill). */
  def linearInterp(df: DataFrame, valueCol: String = Y): DataFrame = {
    val withAnchors = df
      .withColumn("_rn", row_number().over(w).cast("double"))
      .withColumn("_pv", prevNonNull(col(valueCol)))
      .withColumn("_nv", nextNonNull(col(valueCol)))
      .withColumn("_pd", prevNonNull(when(col(valueCol).isNotNull, col("_rn"))))
      .withColumn("_nd", nextNonNull(when(col(valueCol).isNotNull, col("_rn"))))
    withAnchors.withColumn(valueCol,
        coalesce(col(valueCol),
          col("_pv") + (col("_nv") - col("_pv"))
            * (col("_rn") - col("_pd")) / (col("_nd") - col("_pd"))))
      .drop("_rn", "_pv", "_nv", "_pd", "_nd")
  }

  /** Fill with the mean of the previous k non-null observations
    * (`moving_average`, util.py:1076-1095). Single window pass: average of
    * preceding values AFTER forward-filling would bias, so use the raw
    * preceding window restricted to originally non-null cells. */
  def movingAverage(df: DataFrame, k: Int, valueCol: String = Y): DataFrame =
    df.withColumn(valueCol, coalesce(col(valueCol),
      avg(col(valueCol)).over(w.rowsBetween(-k, -1))))

  /** Deterministic noise injection on the cells that were imputed: adds
    * seeded N(0, noiseScale·σ_series) only where `wasMissing`
    * (util.py:1127-1145). */
  def withImputationNoise(df: DataFrame, wasMissing: Column, seed: Long = 42L,
                          noiseScale: Double = 1.0, valueCol: String = Y): DataFrame = {
    val stats = df.filter(!wasMissing).groupBy(SeriesId)
      .agg(stddev_samp(col(valueCol)).as("_sd"))
    df.join(maybeBroadcast(stats), Seq(SeriesId), "left")
      .withColumn(valueCol,
        when(wasMissing, col(valueCol) + randn(seed) * col("_sd") * noiseScale)
          .otherwise(col(valueCol)))
      .drop("_sd")
  }

  /** First-observation strategy 'drop': remove the leading rows of each
    * series that precede the first non-null value (util.py:1035-1049). */
  def dropLeadingNulls(df: DataFrame, valueCol: String = Y): DataFrame =
    df.withColumn("_seen",
        count(col(valueCol)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("_seen") > 0).drop("_seen")

  /** `impute_pool`: fill from a pseudo-random draw (deterministic in ds) out
    * of the previous k non-null observations (util.py:1117-1118). */
  def imputePool(df: DataFrame, k: Int, valueCol: String = Y): DataFrame = {
    val pool = collect_list(col(valueCol)).over(w.rowsBetween(-k, -1))
    df.withColumn("_pool", pool)
      .withColumn(valueCol, coalesce(col(valueCol),
        when(size(col("_pool")) > 0, // guard: pmod by 0 raises under ANSI
          element_at(col("_pool"),
            (pmod(xxhash64(col(Ds)), size(col("_pool"))) + 1).cast("int")))))
      .drop("_pool")
  }

  /** Fill from the mean of previous same-phase (seasonal) observations
    * (`moving_seasonal_average`, util.py:1096-1115). */
  def movingSeasonalAverage(df: DataFrame, m: Int, k: Int, valueCol: String = Y): DataFrame = {
    val phase = pmod(row_number().over(w) - 1, lit(m))
    val pw = Window.partitionBy(col(SeriesId), col("_phase")).orderBy(Ds)
      .rowsBetween(-k, -1)
    df.withColumn("_phase", phase)
      .withColumn(valueCol, coalesce(col(valueCol), avg(col(valueCol)).over(pw)))
      .drop("_phase")
  }
}
