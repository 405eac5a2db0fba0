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

  /** Hashed word-unigram + word-bigram features per document, WITH
    * multiplicity — the fastText feature recipe (Joulin et al. 2016,
    * wordNgrams = 2): every gram hashes into ONE shared `buckets`-sized
    * space (the hashing trick), so the downstream model table is bounded
    * at `buckets` rows BY CONSTRUCTION regardless of corpus size. Hashing
    * is the repo's portable md5-prefix recipe ([[TextOps.hash32]]) so a
    * SQL oracle replays every bucket id exactly. `keep` columns ride
    * along (the train side carries its label). */
  private def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
                             buckets: Int, keep: Seq[String]): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val base = df.select(
      (col(idCol).as("doc") +: keep.map(col)) :+ toks.as("_t"): _*)
    // ONE gram array per doc (unigrams ++ bigrams), ONE explode — a
    // unigram-branch ∪ bigram-branch union would scan the corpus twice
    // per side; the concat costs the same rows the explode emits anyway
    val grams = concat(
      col("_t"),
      zip_with(slice(col("_t"), lit(1), size(col("_t")) - 1),
               slice(col("_t"), lit(2), size(col("_t")) - 1),
               (a, b) => concat_ws(" ", a, b)))
    base.select(
        (col("doc") +: keep.map(col)) :+ explode(grams).as("_g"): _*)
      .withColumn("f", TextOps.hash32(col("_g")) % buckets)
      .drop("_g")
  }

  /** CCNet/fastText-style corpus quality classifier with a TRAIN/SCORE
    * split: a multinomial naive-Bayes linear classifier over hashed
    * word-unigram + bigram features ([[hashedFeatures]]), trained
    * CLOSED-FORM (two count aggregates — no iterative optimizer, so a SQL
    * oracle can replay training AND scoring end to end), scoring every
    * document with its log-odds of the `goodCol` class. The standard
    * companion to the LM-perplexity filter ([[TextOps.knPerplexity]]):
    * perplexity ranks fluency, the classifier ranks domain/quality
    * membership against a labeled reference split.
    *
    * Model (Laplace smoothing, shared feature space of size `buckets`):
    *
    *   `score(d) = ln(N_good/N_bad) + Σ_f∈d [ln P(f|good) − ln P(f|bad)]`,
    *   `P(f|c) = (count_c(f) + α) / (total_c + α·buckets)`,
    *
    * features counted WITH multiplicity. A feature unseen in train (the
    * OOV path a self-scored model never reaches) takes count 0 via the
    * left join — a small but finite log-ratio, never −∞; an EMPTY class
    * degenerates to uniform `P(f|c) = 1/buckets` and a zero prior term
    * (ln of a greatest(…,1) ratio), so every input yields finite scores.
    *
    * Scale shape: training is one gram explode over `train` + ONE
    * aggregate keyed by bucket id — bounded at `buckets` rows out, with
    * map-side partial aggregation collapsing each task to ≤ `buckets`
    * rows, so shuffle volume is independent of corpus size. The model is
    * lazily checkpointed (≤ `buckets` count rows — no storage-pool
    * pressure at any corpus size) and BROADCAST to the score join: the
    * score side is one explode + a broadcast hash join + a per-doc
    * aggregate whose partial combine leaves ~one row per doc per task. No
    * driver state, no unbounded broadcast, no UDFs — the same plan scores
    * a 10⁹-doc corpus with the model shards replaced by the same bounded
    * broadcast.
    *
    * Returns `(doc, n_feats, score)` — one row per scored doc (every doc
    * has ≥ 1 unigram), score unrounded (callers round for comparison). */
  def nbClassifier(train: DataFrame, score: DataFrame, idCol: String,
                   goodCol: String, textCol: String = "text",
                   buckets: Int = 1 << 18, alpha: Double = 1.0): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    require(alpha > 0, s"need alpha > 0, got $alpha")
    val good = col(goodCol).cast("boolean")
    // model: per-bucket class-conditional counts. Lazy local checkpoint =
    // the KN-model pattern: the table has two consumers (the class totals
    // and the score join) that would otherwise each re-run the full train
    // explode; at ≤ `buckets` three-long rows the blocks are trivially
    // small, so the default storage level races nothing (the DISK_ONLY
    // discipline is for O(corpus-types) tables).
    val model = hashedFeatures(train.withColumn("_good", good),
        idCol, textCol, buckets, keep = Seq("_good"))
      .groupBy("f").agg(
        sum(when(col("_good"), 1L).otherwise(0L)).as("cg"),
        sum(when(!col("_good"), 1L).otherwise(0L)).as("cb"))
      .localCheckpoint(false)
    // class feature-occurrence totals + doc-count priors: two one-row
    // frames riding the final plan as broadcast cross joins (no separate
    // driver actions; the totals read the checkpointed model blocks)
    val totals = model.agg(
      coalesce(sum("cg"), lit(0L)).as("tg"),
      coalesce(sum("cb"), lit(0L)).as("tb"))
    val priors = train.agg(
      sum(when(good, 1L).otherwise(0L)).as("ndg"),
      sum(when(!good, 1L).otherwise(0L)).as("ndb"))
    val aB = alpha * buckets
    score.transform(hashedFeatures(_, idCol, textCol, buckets, keep = Nil))
      .join(broadcast(model), Seq("f"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("_llr",
        log((coalesce(col("cg"), lit(0L)).cast("double") + lit(alpha)) /
            (col("tg").cast("double") + lit(aB))) -
        log((coalesce(col("cb"), lit(0L)).cast("double") + lit(alpha)) /
            (col("tb").cast("double") + lit(aB))))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_feats"), sum("_llr").as("_s"))
      .crossJoin(broadcast(priors))
      .select(col("doc"), col("n_feats"),
        (log(greatest(col("ndg"), lit(1L)).cast("double") /
             greatest(col("ndb"), lit(1L)).cast("double")) + col("_s"))
          .as("score"))
  }
}
