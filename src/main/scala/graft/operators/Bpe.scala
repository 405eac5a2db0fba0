package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary training (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units", §3.2) —
  * the training half of the tokenizer story
  * ([[TextOps.bpeishTokenCount]] pre-tokenizes and counts, but cannot
  * learn a vocabulary). Classic BPE: start from per-word character
  * sequences, repeat `merges` times: count every adjacent symbol pair
  * (weighted by word frequency), merge the most frequent pair everywhere,
  * greedy left-to-right within each word.
  *
  * Scale shape — the iterative-pair-count-aggregation design: the corpus
  * is scanned ONCE (token explode → word-type counts, one shuffle keyed
  * by word, output bounded by the corpus VOCABULARY, not its token
  * volume); each merge round is one pair explode + one aggregate over
  * that word-type table plus a top-1 sort, and the evolving symbol table
  * is eagerly local-checkpointed per round so round r's plan never
  * replays rounds 1..r−1. Driver state is exactly the learned merge list
  * (`merges` rows) — the bounded artifact a tokenizer trainer exists to
  * produce. The per-word merge rewrite is a functional `aggregate` fold
  * (greedy left-to-right, the BPE contract: a symbol merged in this
  * round never re-merges as the LEFT side of the same round's pair),
  * pure Column expressions end to end.
  *
  * Determinism: pair ties break by (count desc, left asc, right asc) —
  * binary string order, so a SQL oracle replays the full merge sequence.
  *
  * Returns the merge table `(merge_rank, left_sym, right_sym,
  * pair_count)`, ranks 1..`merges` (fewer if the corpus runs out of
  * adjacent pairs first). */
object Bpe {

  def trainVocab(df: DataFrame, textCol: String = "text",
                 merges: Int = 8): DataFrame = {
    require(merges >= 1, s"need merges >= 1, got $merges")
    val spark = df.sparkSession
    val wordCounts = df
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    var cur = wordCounts
      .select(col("word"), col("cnt"), split(col("word"), "").as("syms"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val top = cur
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((r, a, b, c))
        val folded = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
        // the eager checkpoint materializes the new table's own blocks, so
        // the previous round's (non-replayable) checkpoint blocks are dead
        // weight from here — drop them instead of stacking `merges`
        // vocab-sized tables in the executors' storage
        val prev = cur
        cur = cur.select(col("word"), col("cnt"), folded.as("syms"))
          .localCheckpoint(true)
        prev.unpersist()
        r += 1
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }
}
