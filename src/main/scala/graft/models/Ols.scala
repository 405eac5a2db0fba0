package graft.models

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.core.SeriesFrame._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact pooled OLS via ONE distributed moments aggregation.
  *
  * For deterministic feature sets (trend, Fourier, calendar dummies) the
  * normal equations need only `k(k+1)/2 + k` sums — one whole-frame
  * aggregate — and a k×k solve on the driver (k ≤ ~10). That replaces an
  * MLlib `LinearRegression(normal).fit` + `transform` (≈10 scheduler
  * round-trips through WeightedLeastSquares' instrumentation) with one job
  * plus a pure-expression prediction that stays in whole-stage codegen.
  * Same math as the MLlib normal solver (Cholesky on the normal equations),
  * and the same shape the DuckDB oracles replay ([[graft.OracleGen]]).
  *
  * Train-slice semantics mirror [[MllibTsEstimator.fit]]: observed,
  * non-test, feature-complete rows.
  */
object Ols {

  final case class Fit(intercept: Double, beta: Array[Double], feats: Seq[String]) {
    /** Prediction as a Column expression: intercept + Σ βᵢ·featᵢ. */
    def predictExpr: Column =
      feats.zip(beta.toSeq).foldLeft(lit(intercept))((acc, fb) => acc + col(fb._1) * lit(fb._2))
  }

  /** [[fit]] plus the train-slice sample stddev of every feature — the
    * moments and the second moments share ONE aggregation, so standardized
    * coefficients (|β_j|·sd_j, what a scale-normalized MLlib fit reports)
    * cost no extra job. */
  def fitWithStd(frame: DataFrame, feats: Seq[String]): (Fit, Array[Double]) = {
    val hasTest = frame.columns.contains("is_test")
    val obs = frame.filter(!col(IsFuture) && col(Y).isNotNull)
    val train0 = if (hasTest) obs.filter(!col("is_test")) else obs
    val train = feats.foldLeft(train0)((f, c) => f.filter(col(c).isNotNull))
    val xs: Seq[Column] = lit(1.0) +: feats.map(c => col(c).cast("double"))
    val k = xs.size
    val aggs = (for (i <- 0 until k; j <- 0 to i) yield sum(xs(i) * xs(j)).as(s"a_${i}_$j")) ++
      (0 until k).map(i => sum(xs(i) * col(Y).cast("double")).as(s"b_$i")) ++
      feats.map(c => stddev_samp(col(c).cast("double")).as(s"sd_$c"))
    val r = train.agg(aggs.head, aggs.tail: _*).first()
    val a = DenseMatrix.zeros[Double](k, k)
    val b = DenseVector.zeros[Double](k)
    var idx = 0
    for (i <- 0 until k; j <- 0 to i) { a(i, j) = r.getDouble(idx); a(j, i) = a(i, j); idx += 1 }
    for (i <- 0 until k) { b(i) = r.getDouble(idx); idx += 1 }
    val sds = feats.indices.map(i => r.getDouble(idx + i)).toArray
    val beta = a \ b
    (Fit(beta(0), (1 until k).map(beta(_)).toArray, feats), sds)
  }

  def fit(frame: DataFrame, feats: Seq[String]): Fit = {
    val hasTest = frame.columns.contains("is_test")
    val obs = frame.filter(!col(IsFuture) && col(Y).isNotNull)
    val train0 = if (hasTest) obs.filter(!col("is_test")) else obs
    val train = feats.foldLeft(train0)((f, c) => f.filter(col(c).isNotNull))
    val xs: Seq[Column] = lit(1.0) +: feats.map(c => col(c).cast("double"))
    val k = xs.size
    val aggs = (for (i <- 0 until k; j <- 0 to i) yield sum(xs(i) * xs(j)).as(s"a_${i}_$j")) ++
      (0 until k).map(i => sum(xs(i) * col(Y).cast("double")).as(s"b_$i"))
    val r = train.agg(aggs.head, aggs.tail: _*).first()
    val a = DenseMatrix.zeros[Double](k, k)
    val b = DenseVector.zeros[Double](k)
    var idx = 0
    for (i <- 0 until k; j <- 0 to i) { a(i, j) = r.getDouble(idx); a(j, i) = a(i, j); idx += 1 }
    for (i <- 0 until k) { b(i) = r.getDouble(idx); idx += 1 }
    val beta = a \ b
    Fit(beta(0), (1 until k).map(beta(_)).toArray, feats)
  }
}
