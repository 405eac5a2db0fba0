package graft.results

import graft.models.MllibTsEstimator
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-pipeline persistence — the reference's pickle round-trip
  * (/root/reference/src/scalecast/_Forecaster_parent.py:96-102 and
  * notebooks' `pickle.dump(f)`), re-expressed storage-natively: every fitted
  * transform is (kind, small args, one parquet frame), the estimator spec is
  * one typed row, the results store is a parquet table. Everything writes
  * through Spark, so the same path works on local disk or HDFS/S3 at cluster
  * scale, and loading never pulls data through the driver.
  *
  * Layout under `path/`:
  *   manifest/   (idx, kind, name, m, spec) — one row per stacked transform
  *   t<i>/       the i-th transform's state frame (params / stash / trend /
  *               seasonal)
  *   estimator/  single-row spec (algo, features, param kv, normalizer, seed)
  *   results/    optional long results store
  *
  * MLlib pipeline weights persist separately via `MllibTsEstimator.save`
  * (transfer_predict); this store keeps the SPEC so the model can be refit
  * or reloaded next to its transform stack.
  */
object PipelineStore {

  def save(path: String, stack: TransformStack, spark: SparkSession,
           estimator: Option[MllibTsEstimator] = None,
           results: Option[DataFrame] = None,
           featureSpecs: Seq[graft.functions.FeatureSpec] = Nil): Unit = {
    import spark.implicits._
    // always overwrite specs, even when empty: re-saving over a path that
    // previously carried specs must not leave the stale chain behind for
    // loadFeatureSpecs to replay
    featureSpecs.zipWithIndex.map { case (sp, i) =>
      val (kind, args) = sp.encoded
      (i, kind, args)
    }.toDF("idx", "kind", "args")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/specs")
    val rows = stack.stack.zipWithIndex.map { case (t, i) =>
      t match {
        case e: ExprTransform => (i, "expr", e.name, 0, "")
        case d: DiffTransform => (i, "diff", "", d.m, "")
        case _: DetrendLinear => (i, "detrend_linear", "", 0, "")
        case b: DetrendBasis  => (i, "detrend_basis", "", b.k, b.spec)
        case _: DetrendLoess  => (i, "detrend_loess", "", 0, "")
        case s: Deseason      => (i, "deseason", "", s.m, "")
      }
    }
    rows.toDF("idx", "kind", "name", "m", "spec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
    stack.stack.zipWithIndex.foreach { case (t, i) =>
      val frame = t match {
        case e: ExprTransform => e.params
        case d: DiffTransform => d.stash
        case l: DetrendLinear => l.params
        case b: DetrendBasis  => b.params
        case l: DetrendLoess  => l.trend
        case s: Deseason      => s.seasonal
      }
      frame.write.mode("overwrite").parquet(s"$path/t$i")
    }
    estimator.foreach { e =>
      Seq((e.algo, e.features, e.params.keys.toSeq.sorted,
          e.params.toSeq.sortBy(_._1).map(_._2), e.normalizer, e.seed))
        .toDF("algo", "features", "param_keys", "param_vals", "normalizer", "seed")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/estimator")
    }
    results.foreach(_.write.mode("overwrite").parquet(s"$path/results"))
  }

  def loadStack(spark: SparkSession, path: String): TransformStack = {
    val manifest = spark.read.parquet(s"$path/manifest")
      .orderBy("idx").collect()
    val stack = manifest.toList.map { r =>
      val i = r.getAs[Int]("idx")
      val frame = spark.read.parquet(s"$path/t$i")
      (r.getAs[String]("kind") match {
        case "expr"           => Transforms.rebuildExpr(r.getAs[String]("name"), frame)
        case "diff"           => DiffTransform(r.getAs[Int]("m"), frame)
        case "detrend_linear" => DetrendLinear(frame)
        case "detrend_basis"  =>
          val spec = r.getAs[String]("spec")
          DetrendBasis(Transforms.basisOf(spec), frame, r.getAs[Int]("m"), spec)
        case "detrend_loess"  => DetrendLoess(frame)
        case "deseason"       => Deseason(r.getAs[Int]("m"), frame)
        case other => throw new IllegalArgumentException(s"unknown transform kind $other")
      }): FittedTransform
    }
    TransformStack(stack)
  }

  def loadEstimator(spark: SparkSession, path: String): Option[MllibTsEstimator] = {
    val dir = new java.io.File(s"$path/estimator")
    if (!dir.exists()) None
    else {
      val r = spark.read.parquet(s"$path/estimator").first()
      Some(MllibTsEstimator(
        r.getAs[String]("algo"), r.getSeq[String](r.fieldIndex("features")),
        r.getSeq[String](r.fieldIndex("param_keys"))
          .zip(r.getSeq[Double](r.fieldIndex("param_vals"))).toMap,
        r.getAs[String]("normalizer"), r.getAs[Long]("seed")))
    }
  }

  def loadResults(spark: SparkSession, path: String): Option[DataFrame] = {
    val dir = new java.io.File(s"$path/results")
    if (dir.exists()) Some(spark.read.parquet(s"$path/results")) else None
  }

  /** The recorded feature chain (`infer_apply_Xvar_selection` replay list) —
    * feed to `Forecaster.applySpecs`. */
  def loadFeatureSpecs(spark: SparkSession, path: String): Seq[graft.functions.FeatureSpec] = {
    val dir = new java.io.File(s"$path/specs")
    if (!dir.exists()) Nil
    else spark.read.parquet(s"$path/specs").orderBy("idx").collect().toSeq
      .map(r => graft.functions.FeatureSpec.decode(
        r.getAs[String]("kind"), r.getSeq[String](r.fieldIndex("args"))))
  }
}
