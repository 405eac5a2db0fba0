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

  /** Temperature-scaled mixture sampling (the T5/multilingual-LM
    * `p_d ∝ n_d^α` rule): domain d's share of a `targetTotal`-row training
    * mix is `n_d^α / Σ n^α` — α=1 keeps natural proportions, α=0 equalizes
    * domains, between upweights the tail. Unlike
    * [[stratifiedHashSample]], the per-stratum rates come FROM the data:
    * one tiny aggregation (rows = #strata) broadcast back onto the scan,
    * then the same content-hash membership predicate — so the 100 TB scan
    * is one pass and the sample stays reproducible under reruns and
    * repartitioning. Rates are rounded to 9dp before thresholding so the
    * double `pow`/division math can't flip a boundary row across engines;
    * a stratum whose quota exceeds its size keeps everything (frac
    * capped at 1). */
  def temperatureSample(df: DataFrame, keyCol: String, strataCol: String,
                        alpha: Double, targetTotal: Long,
                        salt: String = ""): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha $alpha out of [0,1]")
    // the counts frame (rows = #strata, tiny) is consumed TWICE in the one
    // output DAG (the _wsum aggregate + the thr crossJoin) with df's whole
    // lineage underneath each copy — a lazy checkpoint materializes it once
    // so df is computed once per pass, not once per plan copy. (Exchange
    // reuse used to hide this accidentally when df's lineage happened to
    // end in an exchange; with keyed checkpoints upstream it no longer
    // does — round-11 find on doc_curation_chain.)
    val counts = df.groupBy(strataCol).agg(count(lit(1)).cast("double").as("_n"))
      .localCheckpoint(false)
    val wsum = counts.agg(sum(pow(col("_n"), alpha)).as("_wsum"))
    val thr = counts.crossJoin(broadcast(wsum))
      .withColumn("_frac", least(lit(1.0),
        lit(targetTotal.toDouble) * pow(col("_n"), alpha) / col("_wsum") / col("_n")))
      .withColumn("_thr", floor(round(col("_frac"), 9) * Buckets).cast("long"))
      .select(col(strataCol), col("_thr"))
    df.join(broadcast(thr), Seq(strataCol))
      .filter(sampleHash(col(keyCol), salt) < col("_thr"))
      .drop("_thr")
  }

  /** Token-budget mixture plan — the unit real training mixes are specified
    * in: a spec maps stratum → share of a `targetTokens` budget, and each
    * stratum's keep-rate is `min(1, budget_d / tokens_d)` where `tokens_d`
    * is its AVAILABLE token volume (row-count rates overshoot long-doc
    * sources; token rates don't). One tiny aggregation (rows = #strata);
    * strata outside the spec get share 0 and surface in the plan with
    * budget 0 rather than vanishing. Budgets round to integer tokens
    * (6dp-rounded before floor so IEEE share·target noise can't drop a
    * token cross-engine); rates round to 9dp before thresholding like the
    * other samplers. */
  def tokenBudgetPlan(df: DataFrame, strataCol: String, tokenCol: Column,
                      targetTokens: Long,
                      shares: Map[String, Double]): DataFrame = {
    require(shares.values.forall(s => s >= 0 && s <= 1),
      "shares must be in [0,1]")
    require(shares.values.sum <= 1.0 + 1e-9, "shares must sum to <= 1")
    val share = shares.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, v).otherwise(acc)
    }
    df.groupBy(strataCol)
      .agg(sum(tokenCol.cast("long")).as("tokens_available"))
      .withColumn("token_budget",
        floor(round(share * targetTokens, 6)).cast("long"))
      .withColumn("rate", round(least(lit(1.0),
        col("token_budget").cast("double") / col("tokens_available")), 9))
  }

  /** Sample a corpus down to a token budget split by a mixture spec: the
    * [[tokenBudgetPlan]] rates, broadcast back onto the scan as the same
    * content-hash membership predicate as every other sampler — one pass,
    * reproducible across engines/partitionings/reruns, and a doc's
    * membership never flips as other docs arrive. Expected sampled tokens
    * per stratum ≈ its integer budget (exact in expectation; the hash
    * realizes it within sampling noise). */
  def tokenBudgetSample(df: DataFrame, keyCol: String, strataCol: String,
                        tokenCol: Column, targetTokens: Long,
                        shares: Map[String, Double],
                        salt: String = ""): DataFrame = {
    val thr = tokenBudgetPlan(df, strataCol, tokenCol, targetTokens, shares)
      .select(col(strataCol),
        floor(col("rate") * Buckets).cast("long").as("_thr"))
    df.join(broadcast(thr), Seq(strataCol))
      .filter(sampleHash(col(keyCol), salt) < col("_thr"))
      .drop("_thr")
  }

  /** The 32-bit sampling bucket of a key (exposed for oracles/tests). */
  def sampleHash(key: Column, salt: String = ""): Column =
    TextOps.hash32(concat(key.cast("string"), lit(salt)))
}
