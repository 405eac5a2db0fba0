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
  * Substitution delta vs the cited algorithm (the prophet_like/tbats_like
  * convention): Sennrich §3.2 appends an end-of-word marker (`·`/`</w>`)
  * to each word's symbol sequence before counting, so word-FINAL and
  * word-INTERNAL occurrences of a symbol are distinct and a merge can
  * target one without the other. This operator trains on the bare
  * per-word character sequences — the two positions conflate, and on
  * corpora where that distinction binds the learned merge sequence
  * differs from the paper's. The operator is self-consistent and
  * deterministic, and the `doc_bpe_vocab` oracle replays exactly these
  * semantics; a caller needing marker parity can append the marker column
  * upstream (one `concat(word, '·')`) without touching this fold.
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
    // LAZY checkpoints throughout: each round's top-pair collect is the
    // first (and only) consumer of the previous rewrite, so it
    // materializes the new table's blocks inside its own job — one
    // scheduler round trip per merge instead of the two an eager
    // checkpoint pays (materialize, then aggregate). The plan is
    // truncated at construction either way, so round r's lineage never
    // replays rounds 1..r−1.
    var cur = wordCounts
      .select(col("word"), col("cnt"), split(col("word"), "").as("syms"))
      .localCheckpoint(false)
    // the previous round's (non-replayable) checkpoint blocks are dead
    // weight once the NEXT table has materialized — genuinely drop the
    // RDD blocks (Dataset.unpersist is a no-op on checkpoint-backed
    // frames: their blocks never enter the CacheManager), but only after
    // the collect below has materialized `cur`, because a localCheckpoint
    // RDD cannot be recomputed from lineage
    var prev: DataFrame = null
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
      if (prev != null) {
        org.apache.spark.sql.GraftCheckpoint.unpersistCheckpoint(prev)
        prev = null
      }
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((r, a, b, c))
        if (r < merges) { // the final round's merge needs no rewrite
          val folded = aggregate(col("syms"),
            array().cast("array<string>"),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x))))
          prev = cur
          cur = cur.select(col("word"), col("cnt"), folded.as("syms"))
            .localCheckpoint(false)
        }
        r += 1
      }
    }
    // the learned merge list is the operator's whole output — no consumer
    // reads the symbol tables past this point, so drop their blocks now
    if (prev != null) org.apache.spark.sql.GraftCheckpoint.unpersistCheckpoint(prev)
    org.apache.spark.sql.GraftCheckpoint.unpersistCheckpoint(cur)
    import spark.implicits._
    learned.toSeq.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }
}
