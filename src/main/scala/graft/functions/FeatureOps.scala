package graft.functions

import graft.core.SeriesFrame._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic feature-column builders (SURVEY.md §2.3). Each op is a
  * pure `withColumn` over the unified (observed ∪ horizon) frame, so all of
  * them stay inside whole-stage codegen and Catalyst can prune/push freely.
  * Columns are recorded by naming convention (`ar_<i>` mirrors the
  * reference's `AR(i)` marker, /root/reference/src/scalecast/classes.py:79-90)
  * so the recursive predictor knows which features are lags of y.
  */
object FeatureOps {

  val ArPrefix = "ar_"

  def arCols(df: DataFrame): Seq[String] =
    df.columns.filter(_.startsWith(ArPrefix)).sortBy(c => c.stripPrefix(ArPrefix).toInt).toSeq

  /** `add_ar_terms(n)` — lags 1..n of y
    * (/root/reference/src/scalecast/Forecaster.py:409-436). Horizon cells
    * come out NULL and are filled by the recursive predictor. */
  def addArTerms(df: DataFrame, n: Int): DataFrame =
    addArLags(df, 1 to n)

  /** `add_AR_terms((N, m))` — seasonal lags m, 2m, .., Nm
    * (/root/reference/src/scalecast/Forecaster.py:438-449). */
  def addSeasonalArTerms(df: DataFrame, n: Int, m: Int): DataFrame =
    addArLags(df, (1 to n).map(_ * m))

  def addArLags(df: DataFrame, lags: Seq[Int]): DataFrame =
    lags.foldLeft(df)((f, i) => f.withColumn(s"$ArPrefix$i", lag(col(Y), i).over(w)))

  /** `add_lagged_terms` — lags of regressors other than y
    * (/root/reference/src/scalecast/_Forecaster_parent.py:1358-1434). */
  def addLaggedTerms(df: DataFrame, cols: Seq[String], lags: Seq[Int]): DataFrame =
    cols.foldLeft(df)((f, c) =>
      lags.foldLeft(f)((g, i) => g.withColumn(s"${c}_lag$i", lag(col(c), i).over(w))))

  /** `add_time_trend` — 1..N integer trend over observed ∪ horizon
    * (/root/reference/src/scalecast/_Forecaster_parent.py:275-293). */
  def addTimeTrend(df: DataFrame, called: String = "t"): DataFrame =
    df.withColumn(called, row_number().over(w).cast("double"))

  /** `add_seasonal_regressors` raw calendar ints
    * (/root/reference/src/scalecast/_Forecaster_parent.py:162-245). */
  def addCalendar(df: DataFrame, parts: Seq[String]): DataFrame =
    parts.foldLeft(df) { (f, p) =>
      val c = p match {
        case "month"      => month(col(Ds))
        case "quarter"    => quarter(col(Ds))
        case "year"       => year(col(Ds))
        case "week"       => weekofyear(col(Ds))
        case "dayofweek"  => dayofweek(col(Ds))
        case "dayofyear"  => dayofyear(col(Ds))
        case "day"        => dayofmonth(col(Ds))
        case "hour"       => hour(col(Ds))
        case other        => throw new IllegalArgumentException(s"unknown calendar part $other")
      }
      f.withColumn(p, c.cast("double"))
    }

  /** Fourier pair for a raw seasonal int: sin/cos(π·raw/(cycle/order)) —
    * exactly the reference's formula
    * (/root/reference/src/scalecast/_Forecaster_parent.py:246-253). */
  def addFourier(df: DataFrame, raw: Column, cycleLen: Double, name: String,
                 fourierOrder: Double = 2.0): DataFrame =
    df.withColumn(s"${name}sin", sin(lit(math.Pi) * raw / (cycleLen / fourierOrder)))
      .withColumn(s"${name}cos", cos(lit(math.Pi) * raw / (cycleLen / fourierOrder)))

  /** `add_cycle` — Fourier pair over the row index for irregular periods
    * (/root/reference/src/scalecast/_Forecaster_parent.py:448-481). */
  def addCycle(df: DataFrame, cycleLen: Double, called: String,
               fourierOrder: Double = 2.0): DataFrame = {
    val t = row_number().over(w).cast("double")
    df.withColumn(s"${called}sin", sin(lit(math.Pi) * t / (cycleLen / fourierOrder)))
      .withColumn(s"${called}cos", cos(lit(math.Pi) * t / (cycleLen / fourierOrder)))
  }

  /** One-hot dummies for a low-cardinality column (levels passed explicitly so
    * the plan is static — mirrors pd.get_dummies,
    * /root/reference/src/scalecast/_Forecaster_parent.py:254-273). */
  def addDummies(df: DataFrame, src: Column, levels: Seq[Any], prefix: String,
                 dropFirst: Boolean = false): DataFrame = {
    val keep = if (dropFirst) levels.drop(1) else levels
    keep.foldLeft(df)((f, v) =>
      f.withColumn(s"$prefix$v", when(src === lit(v), 1.0).otherwise(0.0)))
  }

  /** `add_other_regressor` — 0/1 dummy for a date interval
    * (/root/reference/src/scalecast/_Forecaster_parent.py:483-507). */
  def addIntervalDummy(df: DataFrame, start: String, end: String, called: String): DataFrame =
    df.withColumn(called,
      when(col(Ds).between(lit(start).cast("date"), lit(end).cast("date")), 1.0).otherwise(0.0))

  /** `add_combo_regressors` — elementwise product
    * (/root/reference/src/scalecast/_Forecaster_parent.py:535-570). */
  def addComboTerms(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumn(cols.mkString("_"), cols.map(col).reduce(_ * _))

  /** `add_poly_terms` (/root/reference/src/scalecast/_Forecaster_parent.py:572-593). */
  def addPolyTerms(df: DataFrame, cols: Seq[String], pwr: Int = 2): DataFrame =
    cols.foldLeft(df)((f, c) =>
      (2 to pwr).foldLeft(f)((g, p) => g.withColumn(s"$c^$p", pow(col(c), p))))

  /** `add_exp_terms` — x^float (/root/reference/src/scalecast/_Forecaster_parent.py:595-629). */
  def addExpTerms(df: DataFrame, cols: Seq[String], pwr: Double): DataFrame =
    cols.foldLeft(df)((f, c) => f.withColumn(s"$c^$pwr", pow(col(c), pwr)))

  /** `add_logged_terms` (/root/reference/src/scalecast/_Forecaster_parent.py:631-673). */
  def addLoggedTerms(df: DataFrame, cols: Seq[String], base: Double = math.E): DataFrame =
    cols.foldLeft(df)((f, c) =>
      f.withColumn(s"ln_$c", if (base == math.E) log(col(c)) else log(base, col(c))))
}
