package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-mix construction.
  *
  * `df.sample()` is seed-and-partitioning dependent — re-running on a
  * repartitioned 100 TB corpus yields a DIFFERENT sample, which breaks
  * reproducible dataset builds. These samplers key on a CONTENT hash
  * (md5-derived 32-bit bucket, the same portable hash family as
  * [[Dedup.minhashSignatures]]), so membership is a pure row-local predicate:
  * reproducible across engines, partitionings, and reruns; pushed to the
  * scan; and stable under corpus growth (a doc's membership never flips
  * when other docs arrive — the property quota resamples need).
  */
object Sampling {

  private val Buckets = 1L << 32

  /** Keep rows whose hash bucket falls under `fraction`. `salt` decorrelates
    * independent samples of the same corpus. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of [0,1]")
    df.filter(sampleHash(col(keyCol), salt) < (fraction * Buckets).toLong)
  }

  /** Per-stratum fractions (training-mix quotas): rows of a stratum not in
    * `fractions` keep `default`. One scan, no shuffle — the quota decision
    * is a row-local CASE over the same content hash. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           fractions: Map[String, Double],
                           default: Double = 0.0, salt: String = ""): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0,1]")
    val frac = fractions.foldLeft(lit(default)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, f).otherwise(acc)
    }
    df.filter(sampleHash(col(keyCol), salt) < (frac * Buckets).cast("long"))
  }

  /** The 32-bit sampling bucket of a key (exposed for oracles/tests). */
  def sampleHash(key: Column, salt: String = ""): Column =
    TextOps.hash32(concat(key.cast("string"), lit(salt)))
}
