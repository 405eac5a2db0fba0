package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A replayable feature-construction step — the fix-by-design for
  * `infer_apply_Xvar_selection`
  * (/root/reference/src/scalecast/util.py:343-388): the reference re-derives
  * a fitted Forecaster's feature recipe by PARSING ITS COLUMN NAMES
  * ("AR1" → add_ar_terms ...); here every facade `add*` records an explicit
  * spec, so replaying a selection onto another series is just re-running the
  * recorded list — no name parsing, no ambiguity, and the list persists in
  * [[graft.results.PipelineStore]] manifests next to the transform stack.
  *
  * Each case maps 1:1 onto a [[FeatureOps]] builder (or a trivial column
  * expression) and round-trips through `encoded`/`decode` for storage.
  */
sealed trait FeatureSpec extends Serializable {
  def apply(frame: DataFrame): DataFrame
  /** (kind, args) for persistence; args are strings for a uniform schema. */
  def encoded: (String, Seq[String])
}

object FeatureSpec {

  final case class ArTerms(n: Int) extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = FeatureOps.addArTerms(f, n)
    def encoded: (String, Seq[String]) = ("ar", Seq(n.toString))
  }
  final case class SeasonalArTerms(n: Int, m: Int) extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = FeatureOps.addSeasonalArTerms(f, n, m)
    def encoded: (String, Seq[String]) = ("sar", Seq(n.toString, m.toString))
  }
  final case class LaggedTerms(cols: Seq[String], lags: Seq[Int]) extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = FeatureOps.addLaggedTerms(f, cols, lags)
    def encoded: (String, Seq[String]) =
      ("lagged", Seq(cols.mkString(","), lags.mkString(",")))
  }
  final case class TimeTrend(called: String = "t") extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = FeatureOps.addTimeTrend(f, called)
    def encoded: (String, Seq[String]) = ("trend", Seq(called))
  }
  final case class Calendar(parts: Seq[String]) extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = FeatureOps.addCalendar(f, parts)
    def encoded: (String, Seq[String]) = ("calendar", Seq(parts.mkString(",")))
  }
  final case class Fourier(raw: String, cycleLen: Double, name: String,
                           order: Double = 2.0) extends FeatureSpec {
    def apply(f: DataFrame): DataFrame =
      FeatureOps.addFourier(f, col(raw), cycleLen, name, order)
    def encoded: (String, Seq[String]) =
      ("fourier", Seq(raw, cycleLen.toString, name, order.toString))
  }
  final case class Cycle(cycleLen: Double, called: String,
                         order: Double = 2.0) extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = FeatureOps.addCycle(f, cycleLen, called, order)
    def encoded: (String, Seq[String]) =
      ("cycle", Seq(cycleLen.toString, called, order.toString))
  }
  final case class IntervalDummy(start: String, end: String, called: String)
      extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = FeatureOps.addIntervalDummy(f, start, end, called)
    def encoded: (String, Seq[String]) = ("interval", Seq(start, end, called))
  }
  final case class ComboTerms(cols: Seq[String]) extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = FeatureOps.addComboTerms(f, cols)
    def encoded: (String, Seq[String]) = ("combo", Seq(cols.mkString(",")))
  }
  final case class PolyTerms(cols: Seq[String], pwr: Int) extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = FeatureOps.addPolyTerms(f, cols, pwr)
    def encoded: (String, Seq[String]) = ("poly", Seq(cols.mkString(","), pwr.toString))
  }
  final case class ExpTerms(cols: Seq[String], pwr: Double) extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = FeatureOps.addExpTerms(f, cols, pwr)
    def encoded: (String, Seq[String]) = ("exp", Seq(cols.mkString(","), pwr.toString))
  }
  final case class LoggedTerms(cols: Seq[String], base: Double = math.E)
      extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = FeatureOps.addLoggedTerms(f, cols, base)
    def encoded: (String, Seq[String]) = ("logged", Seq(cols.mkString(","), base.toString))
  }
  /** `name := src²` — the auto_Xvar search's quadratic-trend candidate
    * ("t2"); distinct from [[PolyTerms]] only in the output column name. */
  final case class Squared(src: String, name: String) extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = f.withColumn(name, col(src) * col(src))
    def encoded: (String, Seq[String]) = ("squared", Seq(src, name))
  }
  /** `drop_regressors`, recorded so a replay drops the same columns. */
  final case class DropCols(cols: Seq[String]) extends FeatureSpec {
    def apply(f: DataFrame): DataFrame = f.drop(cols: _*)
    def encoded: (String, Seq[String]) = ("drop", Seq(cols.mkString(",")))
  }

  private def ints(s: String): Seq[Int] =
    if (s.isEmpty) Nil else s.split(',').toSeq.map(_.toInt)
  private def strs(s: String): Seq[String] =
    if (s.isEmpty) Nil else s.split(',').toSeq

  def decode(kind: String, args: Seq[String]): FeatureSpec = kind match {
    case "ar"       => ArTerms(args(0).toInt)
    case "sar"      => SeasonalArTerms(args(0).toInt, args(1).toInt)
    case "lagged"   => LaggedTerms(strs(args(0)), ints(args(1)))
    case "trend"    => TimeTrend(args(0))
    case "calendar" => Calendar(strs(args(0)))
    case "fourier"  => Fourier(args(0), args(1).toDouble, args(2), args(3).toDouble)
    case "cycle"    => Cycle(args(0).toDouble, args(1), args(2).toDouble)
    case "interval" => IntervalDummy(args(0), args(1), args(2))
    case "combo"    => ComboTerms(strs(args(0)))
    case "poly"     => PolyTerms(strs(args(0)), args(1).toInt)
    case "exp"      => ExpTerms(strs(args(0)), args(1).toDouble)
    case "logged"   => LoggedTerms(strs(args(0)), args(1).toDouble)
    case "squared"  => Squared(args(0), args(1))
    case "drop"     => DropCols(strs(args(0)))
    case other      => throw new IllegalArgumentException(s"unknown feature spec kind $other")
  }
}
