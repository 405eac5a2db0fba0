package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based document quality gates — the published Gopher/C4
  * heuristics (Gopher: Rae et al. 2021, "Scaling Language Models", §A1.1
  * repetition filters; C4: Raffel et al. 2020 §2.2) that sit between raw
  * web text and LLM training. Complements [[graft.functions.TextOps]]'s
  * length/stopword stats with the n-gram REPETITION signals those filters
  * key on:
  *
  *  - `top2gram_frac`: character fraction of the single most frequent word
  *    2-gram (Gopher gates this at 0.20);
  *  - `dup3gram_frac`: character fraction covered by 3-grams that occur at
  *    least twice (the duplicate-n-gram family, representative n = 3);
  *  - `mean_word_len`: Gopher keeps documents with mean word length in
  *    [3, 10].
  *
  * Shapes: one n-gram explode + ONE shuffle keyed by (doc, gram) + a
  * per-doc aggregate — the same inverted-index discipline as
  * [[Dedup.jaccardPairs]], so the op scales with corpus size, not with any
  * per-doc quadratic. Char accounting uses the gram's own character length
  * (words + separating spaces) against the document's total characters —
  * occurrences are counted with multiplicity (the common published
  * approximation; exact-span dedup of overlapping occurrences is a
  * sequential-per-doc refinement the thresholds don't need).
  */
object Quality {

  /** Word n-grams WITH multiplicity (unlike [[Dedup.shingles]], which
    * dedups for set-Jaccard): (doc, gram, gram_chars). A native sequence
    * explode + direct array indexing — the old interpreted
    * `transform(…, i -> concat_ws(slice(…)))` lambda materialized every
    * doc's full gram array per row before exploding; this keeps the whole
    * gram construction inside whole-stage codegen. */
  private def ngrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    df.select(col(idCol).as("doc"), toks.as("_t"))
      .filter(size(col("_t")) >= n)
      .select(col("doc"),
        expr(s"explode(sequence(0, size(_t) - $n))").as("_i"), col("_t"))
      .select(col("doc"),
        concat_ws(" ", (0 until n).map(j => expr(s"_t[_i + $j]")): _*).as("gram"))
      .withColumn("gram_chars", length(col("gram")))
  }

  /** Per-document repetition statistics (see object doc). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("doc"),
      length(col(textCol)).cast("double").as("_nc"),
      (length(col(textCol)) - size(TextOps.tokens(col(textCol))) + 1)
        .cast("double").as("_wc"), // total word chars = chars - (n_tokens-1) spaces
      size(TextOps.tokens(col(textCol))).cast("double").as("_nt"))
    val g2 = ngrams(df, idCol, textCol, 2)
      .groupBy("doc", "gram").agg(count(lit(1)).as("c"), first("gram_chars").as("gc"))
      .groupBy("doc").agg(max(col("c") * col("gc")).cast("double").as("_top2chars"))
    val g3 = ngrams(df, idCol, textCol, 3)
      .groupBy("doc", "gram").agg(count(lit(1)).as("c"), first("gram_chars").as("gc"))
      .groupBy("doc").agg(
        sum(when(col("c") >= 2, col("c") * col("gc")).otherwise(0))
          .cast("double").as("_dup3chars"))
    base
      .join(g2, Seq("doc"), "left")
      .join(g3, Seq("doc"), "left")
      .select(col("doc"),
        (coalesce(col("_top2chars"), lit(0.0)) / col("_nc")).as("top2gram_frac"),
        (coalesce(col("_dup3chars"), lit(0.0)) / col("_nc")).as("dup3gram_frac"),
        (col("_wc") / col("_nt")).as("mean_word_len"))
  }

  /** The composite keep gate over [[repetitionStats]], Gopher-style
    * thresholds: mean word length in [minWordLen, maxWordLen], top-2-gram
    * char fraction ≤ maxTop2, duplicate-3-gram char fraction ≤ maxDup3. */
  def gopherKeep(stats: DataFrame,
                 minWordLen: Double = 3.0, maxWordLen: Double = 10.0,
                 maxTop2: Double = 0.20, maxDup3: Double = 0.30): DataFrame =
    stats.withColumn("keep",
      col("mean_word_len") >= minWordLen && col("mean_word_len") <= maxWordLen &&
        col("top2gram_frac") <= maxTop2 && col("dup3gram_frac") <= maxDup3)

  /** Filter a corpus by the gate — the end-to-end cleaning step. */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = gopherKeep(repetitionStats(df, idCol, textCol))
      .filter(col("keep")).select(col("doc").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
