package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining — the concat-and-chunk scheme
  * (documents are concatenated in a fixed order and split into fixed-size
  * context windows, documents straddling boundaries; the batching layout
  * GPT-style pretraining uses, cf. GPT-2/3 and the C4/Pile loaders):
  * given per-document token counts, assign every document its byte-offset
  * interval in the packed token stream and the context-window ids it spans.
  *
  * Scale shape: documents are first routed to `nShards` independent shards
  * by content hash (the same portable md5 family as [[Sampling]]), and the
  * running-offset window runs PER SHARD — so the only ordered scan is
  * within a shard, shards pack in parallel, and chunk identity is the pair
  * (shard, chunk). Order within a shard is (hash, id): deterministic,
  * engine-independent, and stable under partitioning — the whole layout is
  * reproducible from the corpus alone, which is what makes resumable /
  * auditable pretraining data possible.
  */
object Packing {

  /** Per-document packing positions: (…, shard, offset_start, chunk_start,
    * chunk_end) where offsets count tokens within the shard's concatenated
    * stream and chunks are `budget`-token context windows. */
  def concatChunks(df: DataFrame, idCol: String, tokenCountCol: String,
                   budget: Int, nShards: Int = 64): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    val h = TextOps.hash32(col(idCol).cast("string"))
    val w = Window.partitionBy("shard").orderBy(col("_h"), col(idCol))
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(nShards)).cast("int"))
      .withColumn("offset_start",
        coalesce(sum(col(tokenCountCol))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("chunk_start", floor(col("offset_start") / budget).cast("long"))
      .withColumn("chunk_end",
        floor((col("offset_start") + col(tokenCountCol) - 1) / budget).cast("long"))
      .drop("_h")
  }
}
