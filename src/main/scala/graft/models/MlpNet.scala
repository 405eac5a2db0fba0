package graft.models

import breeze.linalg.{DenseMatrix, DenseVector}
import breeze.optimize.{DiffFunction, LBFGS}
import graft.core.SeriesFrame._
import graft.functions.DotProduct.dotNative
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** One-hidden-layer neural-network regressor — the reference's `mlp`
  * estimator (/root/reference/src/scalecast/cfg.py:26-48,
  * sklearn.neural_network.MLPRegressor).
  *
  * DOCUMENTED SUBSTITUTION in the optimizer and activation, same model
  * family (the `sgd` precedent): sklearn trains ReLU nets with Adam on
  * mini-batches and a random seed; this trains a tanh net with FULL-BATCH
  * Breeze L-BFGS from a DETERMINISTIC hash-seeded Glorot init — so fits are
  * bit-reproducible across runs and partitionings, which the engine's
  * correctness machinery (and a tuning grid replay) requires. Loss is the
  * same penalized MSE: ½·mean (ŷ−y)² + α(‖W₁‖² + ‖w₂‖²).
  *
  * The target is internally z-scored for conditioning and the output weights
  * are un-scaled after training, so predictions are on the original scale.
  *
  * Spark shape: per-series driver fit over a series-length-sized design
  * (SURVEY §4 — the reference's unit of work), columnar prediction: hidden
  * units broadcast as rows, per-row pre-activations via the native codegen
  * dot product, `tanh` + weighted sum in one aggregation. No UDFs.
  */
final class MlpModel(override val uid: String, unitRows: DataFrame,
                     b2: Double, features: Seq[String],
                     shift: Array[Double], scale: Array[Double])
  extends Transformer {

  def this(unitRows: DataFrame, b2: Double, features: Seq[String],
           shift: Array[Double], scale: Array[Double]) =
    this(Identifiable.randomUID("mlp"), unitRows, b2, features, shift, scale)

  override def copy(extra: ParamMap): MlpModel = this
  override def transformSchema(schema: StructType): StructType =
    schema.add("yhat", org.apache.spark.sql.types.DoubleType)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val withId = df.withColumn("_rid", monotonically_increasing_id())
      .localCheckpoint(true)
    val complete = features.foldLeft(withId)((f, c) =>
      f.filter(col(c).isNotNull && !isnan(col(c))))
    val xv = array(features.zipWithIndex.map { case (c, i) =>
      (col(c) - lit(shift(i))) / lit(scale(i)) }: _*)
    val scored = complete
      .withColumn("_xv", xv)
      .join(broadcast(unitRows)) // (w: array, b, w2) — h rows
      .withColumn("_t", col("_w2") * tanh(dotNative(col("_xv"), col("_w")) + col("_b")))
      .groupBy("_rid").agg(sum(col("_t")).as("_h"))
    withId.join(scored, Seq("_rid"), "left")
      .withColumn("yhat", col("_h") + lit(b2))
      .drop("_rid", "_h")
  }
}

object MlpNet {

  val MaxTrainRows = 100000

  /** Deterministic pseudo-uniform in (−1, 1) from (seed, index). */
  private def hashUnit(seed: Long, idx: Int): Double = {
    var h = seed * 6364136223846793005L + idx * 1442695040888963407L
    h ^= (h >>> 33); h *= -7046029254386353131L; h ^= (h >>> 29)
    ((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }

  /** Fitted local net — pure JVM state, serializable into executor tasks. */
  private[models] final case class LocalMlp(
      w1: Array[Array[Double]], b1: Array[Double], w2: Array[Double],
      b2: Double, shift: Array[Double], scale: Array[Double]) {
    def predict(xRaw: Array[Double]): Double = {
      val d = shift.length
      val x = Array.tabulate(d)(j => (xRaw(j) - shift(j)) / scale(j))
      var s = b2
      var u = 0
      while (u < w2.length) {
        var pre = b1(u)
        var j = 0
        while (j < d) { pre += w1(u)(j) * x(j); j += 1 }
        s += w2(u) * math.tanh(pre)
        u += 1
      }
      s
    }
  }

  /** The deterministic L-BFGS solve over raw (X, y). */
  private[models] def solveLocal(xRaw: DenseMatrix[Double], yRaw: DenseVector[Double],
                                 hidden: Int, alpha: Double, maxIter: Int,
                                 seed: Long): LocalMlp = {
    val n = xRaw.rows
    require(n > 0, "mlp: empty training set")
    require(n <= MaxTrainRows,
      s"mlp: $n training rows exceeds the per-series bound $MaxTrainRows")
    val d = xRaw.cols
    val h = hidden

    val shift = Array.tabulate(d)(j => breeze.stats.mean(xRaw(::, j)))
    val scale = Array.tabulate(d) { j =>
      val s = breeze.stats.stddev(xRaw(::, j)); if (s > 0) s else 1.0
    }
    val x = DenseMatrix.tabulate(n, d)((i, j) => (xRaw(i, j) - shift(j)) / scale(j))
    val muY = breeze.stats.mean(yRaw)
    val sdY = { val s = breeze.stats.stddev(yRaw); if (s > 0) s else 1.0 }
    val y = (yRaw - muY) / sdY

    // θ = [W1 (h·d) | b1 (h) | w2 (h) | b2], Glorot-scaled deterministic init
    val nParams = h * d + h + h + 1
    val r = math.sqrt(6.0 / (d + h))
    val init = DenseVector.tabulate(nParams) { i =>
      if (i < h * d + h) hashUnit(seed, i) * r else hashUnit(seed, i) * 0.1
    }

    val loss = new DiffFunction[DenseVector[Double]] {
      override def calculate(theta: DenseVector[Double]): (Double, DenseVector[Double]) = {
        // explicit row-major indexing (Breeze reshape is column-major)
        val w1 = DenseMatrix.tabulate(h, d)((u, j) => theta(u * d + j))
        val b1 = theta(h * d until h * d + h).toDenseVector
        val w2 = theta(h * d + h until h * d + 2 * h).toDenseVector
        val bb2 = theta(nParams - 1)
        // forward: Z (n×h) = tanh(X W1ᵀ + b1)
        val pre = x * w1.t
        val z = DenseMatrix.tabulate(n, h)((i, u) => math.tanh(pre(i, u) + b1(u)))
        val yhat = z * w2 + bb2
        val e = yhat - y
        val obj = 0.5 * (e dot e) / n +
          alpha * ((w1.toDenseVector dot w1.toDenseVector) + (w2 dot w2))
        // backward
        val gW2 = (z.t * e) / n.toDouble + w2 * (2.0 * alpha)
        val gB2 = breeze.linalg.sum(e) / n
        // δ (n×h) = (e w2ᵀ) ⊙ (1 − z²)
        val delta = DenseMatrix.tabulate(n, h)((i, u) =>
          e(i) * w2(u) * (1.0 - z(i, u) * z(i, u)))
        val gW1 = (delta.t * x) / n.toDouble + w1 * (2.0 * alpha)
        val gB1 = DenseVector.tabulate(h)(u => breeze.linalg.sum(delta(::, u)) / n)
        val gW1Flat = DenseVector.tabulate(h * d)(i => gW1(i / d, i % d))
        val grad = DenseVector.vertcat(gW1Flat, gB1, gW2, DenseVector(gB2))
        (obj, grad)
      }
    }
    val opt = new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 7,
      tolerance = 1e-9)
    val theta = opt.minimize(loss, init)

    // un-scale the target: ŷ = μy + σy(Σ w2·tanh(·) + b2) folds into w2/b2
    LocalMlp(
      Array.tabulate(h, d)((u, j) => theta(u * d + j)),
      Array.tabulate(h)(u => theta(h * d + u)),
      Array.tabulate(h)(u => sdY * theta(h * d + h + u)),
      muY + sdY * theta(nParams - 1),
      shift, scale)
  }

  /** Train on observed, non-test, feature-complete rows of (typically) one
    * series; returns the columnar-prediction Transformer. */
  def fit(frame: DataFrame, features: Seq[String],
          hidden: Int = 8, alpha: Double = 1e-4,
          maxIter: Int = 300, seed: Long = 42L): MlpModel = {
    val rows = Svr.trainRows(frame, features)
    val n = rows.length
    val d = features.length
    val xRaw = DenseMatrix.tabulate(n, d)((i, j) => rows(i).getDouble(j))
    val yRaw = DenseVector.tabulate(n)(i => rows(i).getDouble(d))
    val m = solveLocal(xRaw, yRaw, hidden, alpha, maxIter, seed)
    val spark = frame.sparkSession
    import spark.implicits._
    val units = m.w1.indices.map(u => (m.w1(u), m.b1(u), m.w2(u)))
      .toDF("_w", "_b", "_w2")
    new MlpModel(units.localCheckpoint(true), m.b2, features, m.shift, m.scale)
  }

  /** The 10⁶-series path (the [[Svr.fitPredictBySeries]] twin): per-series
    * L-BFGS fit + score inside ONE `flatMapGroups` pass — one shuffle keyed
    * by series_id, no driver or broadcast state. Output: (series_id, ds,
    * yhat) for every feature-complete row. */
  def fitPredictBySeries(frame: DataFrame, features: Seq[String],
                         hidden: Int = 8, alpha: Double = 1e-4,
                         maxIter: Int = 300, seed: Long = 42L): DataFrame =
    Svr.groupedFitPredict(frame, features) { (x, y) =>
      solveLocal(x, y, hidden, alpha, maxIter, seed).predict _
    }
}
