package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Pins the round-5 cache-hygiene and pin-gate contracts:
  *
  *  - no dedup/ANN operator leaves a permanent `.cache()` entry behind
  *    (storage for a library user calling them repeatedly must not accrue —
  *    materialization goes through localCheckpoint, whose blocks the
  *    ContextCleaner releases once the frame is unreferenced);
  *  - the full-width repartition pin on the band self-joins engages ONLY
  *    above the [[Dedup.PinRowsPerPartition]] volume gate (the unconditional
  *    pin was the round-4 doc_minhash_lsh regression: at 5k docs the extra
  *    exchange cost more than it saved, while at cluster scale it is what
  *    keeps AQE from funneling the exploding join onto a few tasks).
  */
class DedupHygieneSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"tok${i % 7} alpha beta gamma delta tok$i end"))
      .toDF("doc_id", "text")
  }

  test("dedup/ANN ops leave no permanent cache entries") {
    import spark.implicits._
    val d = docs(6)
    Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.1, 100).count()
    Dedup.minhashCandidates(d, "doc_id", "text").count()
    Dedup.simhashPairs(d, "doc_id", "text", 4).count()
    val vecs = (1 to 5).map(i => (i.toLong, Array(i.toFloat, 1f, 0f)))
      .toDF("vec_id", "embedding")
    Similarity.cosineKnn(vecs, "vec_id", "embedding", 2).count()
    Similarity.cosineKnnLsh(vecs, "vec_id", "embedding", 2, 2).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "an operator left a permanent cache entry in the session CacheManager")
  }

  test("band-join pin engages only above the volume gate") {
    // 2 shuffle partitions in the test session → gate at 8192 banded rows
    val nPart = spark.sessionState.conf.numShufflePartitions
    val gate = Dedup.PinRowsPerPartition * nPart
    val smallPlan = Dedup.minhashCandidates(docs(8), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!smallPlan.contains("REPARTITION_BY_NUM"),
      "small input must not pay a dedicated repartition exchange")
    val bigN = (gate / 4).toInt + 8 // bands = 4 → banded rows just over gate
    val bigPlan = Dedup.minhashCandidates(docs(bigN), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(bigPlan.contains("REPARTITION_BY_NUM"),
      "above the gate the band join must be pinned full-width")
  }
}
