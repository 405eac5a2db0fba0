package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — remove training documents that overlap an
  * evaluation/benchmark corpus (the n-gram-overlap protocol popularized by
  * GPT-3 (Brown et al. 2020, §C) and used by most LLM training pipelines):
  * a training doc is contaminated when a large-enough fraction of its
  * distinct word n-grams also appears in SOME single benchmark doc.
  *
  * Shape: both sides shingle through [[Dedup.shingles]], the candidate
  * generation is an EQUI-join keyed by shingle (inverted index — never
  * train × bench), and the per-(train, bench) overlap count is one shuffle
  * keyed by the pair. The benchmark side is typically tiny relative to the
  * training corpus, so its shingle index behaves like a semi-join filter;
  * cost is proportional to SHARED shingle volume, the same discipline as
  * [[Dedup.jaccardPairs]]'s capped index.
  */
object Decontaminate {

  /** Contaminated (train, bench) pairs with the overlap fraction:
    * |shingles(train) ∩ shingles(bench)| / |shingles(train)| ≥ minFrac.
    * Self-pairs (same id on both sides, e.g. when the benchmark is carved
    * from the corpus itself) are excluded. */
  def contaminatedPairs(train: DataFrame, bench: DataFrame,
                        idCol: String, textCol: String,
                        n: Int = 3, minFrac: Double = 0.5): DataFrame = {
    val ts = Dedup.shingles(train, idCol, textCol, n)
    val bs = Dedup.shingles(bench, idCol, textCol, n)
      .withColumnRenamed("doc", "bench_id")
    val sizes = ts.groupBy("doc").agg(count(lit(1)).as("_sz"))
    ts.join(bs, Seq("shingle"))
      .filter(col("doc") =!= col("bench_id"))
      .groupBy("doc", "bench_id").agg(count(lit(1)).as("_common"))
      .join(sizes, Seq("doc"))
      .withColumn("overlap_frac", col("_common") / col("_sz"))
      .filter(col("overlap_frac") >= minFrac)
      .select(col("doc"), col("bench_id"), col("overlap_frac"))
  }

  /** The cleaned training corpus: drop every doc contaminated against ANY
    * benchmark doc (anti-join on the flagged ids). */
  def clean(train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
            n: Int = 3, minFrac: Double = 0.5): DataFrame = {
    val bad = contaminatedPairs(train, bench, idCol, textCol, n, minFrac)
      .select(col("doc").as(idCol)).distinct()
    train.join(bad, Seq(idCol), "left_anti")
  }
}
