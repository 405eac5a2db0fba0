package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reduce-width sizing for the operators' EXPLICIT exchanges — the
  * §2.9.12 lesson promoted from the scale battery into the library.
  *
  * The battery proved two constraints on a keyed exchange's width at a
  * shared memory pool:
  *
  *  1. partitions must be SMALL enough that one partition's sort/agg fits
  *     an executor's task share (the per-task OOM guard);
  *  2. width must NOT grow faster than exchange BYTES: each map task
  *     writes one compressed segment per reduce partition, so a
  *     rows-proportional rule on thin rows drives segment count quadratic
  *     in scale — 2.46M ~3.8 KB zstd frames at the 10⁷-series point, all
  *     fixed-cost codec init/flush, measured ×30/decade map-stage
  *     core-sec before the fix (fit_by_series 192.9 → 97.3 s at 10⁷ from
  *     width alone).
  *
  * Both are satisfied by sizing on the BYTES ESTIMATE at ~[[TargetPartitionBytes]]
  * per partition: thin and wide rows land the same partition byte size,
  * and segments stay ≥ a few MB through the measured decades. The session
  * width is a FLOOR, never shrunk (a user's parallelism choice is theirs;
  * at fixture scale every estimate is below one target partition and
  * plans are byte-identical to the historical ones), and [[MaxWidth]]
  * caps scheduler/file pressure exactly as the battery does.
  *
  * Scope: explicit `repartition(n, keys)` pins and keyed checkpoints —
  * the exchanges AQE can never re-plan (`REPARTITION_BY_NUM` is exempt
  * from coalescing by contract, which is why the operators pin it in the
  * first place). Planner-inserted exchanges (plain groupBy/join) stay on
  * `spark.sql.shuffle.partitions` + AQE's advisory coalescing, which is
  * the right owner for those.
  */
object Widths {

  /** Plan-estimate bytes per reduce partition. Catalyst estimates are
    * uncompressed-ish and off by small factors through Generate nodes;
    * 64 MB keeps the resulting partitions inside a task's share at the
    * measured points even a few× off in either direction. */
  val TargetPartitionBytes: Long = 64L << 20

  /** 8192 = the battery's cap: ~nothing to the scheduler, and the
    * serialized sort writer emits one data+index file per MAP task
    * regardless of reduce width, so the fd budget is unaffected. */
  val MaxWidth: Int = 8192

  /** Per-partition byte target for exchanges whose reduce-side consumer
    * is a HASH AGGREGATE over ~unique keys (the span ops' window-hash
    * counts): the binding constraint there is the per-task key map, not
    * sort-run size — 64 MB of 28 B rows is ~2.3M map entries per task,
    * which spilled and cost dup_spans' 2×10⁶ anchor +21% vs the sized
    * battery; 16 MB (~600k entries) keeps the map in the task share
    * while segments stay ≫ the codec floor. */
  val AggTargetPartitionBytes: Long = 16L << 20

  /** Width for an explicit exchange expected to carry `bytesEstimate`:
    * session width floored, bytes/`targetPartitionBytes` when larger,
    * [[MaxWidth]] capped. */
  def forBytes(spark: SparkSession, bytesEstimate: BigInt,
               targetPartitionBytes: Long = TargetPartitionBytes): Int = {
    val session = spark.sessionState.conf.numShufflePartitions
    val byBytes = (bytesEstimate / targetPartitionBytes)
      .min(MaxWidth).max(0).toInt
    math.max(session, byBytes)
  }

  /** Largest single-exchange estimate treated as signal: one petabyte.
    * The design target is 100 TB, and MaxWidth saturates at ~0.5 TB of
    * estimate anyway — while the width-ratio-scaled sentinel garbage a
    * Project over a stat-less leaf produces stays ≥ Long.MaxValue/2048
    * ≈ 4.5e15 for any plausible column subset. A genuine ≥1 PB exchange
    * should be sized by its caller from a counted row model
    * ([[forRows]]), not an optimizer estimate. */
  val SaneEstimateBytes: BigInt = BigInt(1L) << 50

  /** [[forBytes]] from the frame's own Catalyst size estimate — for call
    * sites with no cheaper estimate in hand. Costs one driver-side
    * analyze/optimize pass of the subtree (no action).
    *
    * `expansion` corrects the one systematic blind spot: Catalyst's
    * size-only visitor passes a Generate (explode) child's estimate
    * THROUGH, so a frame that fans each document out into per-token or
    * per-gram rows reports the document bytes, not the row volume
    * (measured 5.8× low on the 2×10⁷ fingerprint index). Callers that
    * know their fan-out shape pass the row-model multiplier; the ones
    * that don't still get the session floor and a conservative width.
    *
    * A frame whose LEAF has no statistics (an RDD-backed createDataFrame,
    * a plain localCheckpoint without injected stats, a streaming/JDBC
    * source) reports `spark.sql.defaultSizeInBytes` = Long.MaxValue —
    * and a Project above such a leaf SCALES the sentinel by the
    * output/child row-width ratio, producing huge-but-finite garbage that
    * an exact-sentinel compare would miss. Feeding either to [[forBytes]]
    * would silently size EVERY consumer at [[MaxWidth]] (an 8192-task
    * exchange for a 100-row frame). Any estimate at or above
    * [[SaneEstimateBytes]] (or the configured default, whichever is
    * smaller) is treated as estimator failure, not signal: fall back to
    * the session width, which is what the caller ran with before sizing
    * existed.
    *
    * Do NOT hand this a JOIN-derived frame: the size-only visitor
    * MULTIPLIES a join's child estimates, which is inflated-but-finite
    * and sails past the sentinel guard — a 30 MB fixture estimated its
    * way to an 8192-wide exchange and paid 4.6 s of pure segment
    * overhead (round 13, spanLeakageMatrix's first cut). Size from the
    * scan-side frame with the row-model `expansion`, or pay a count and
    * use [[forRows]]. */
  def forExchange(df: DataFrame, expansion: Double = 1.0,
                  targetPartitionBytes: Long = TargetPartitionBytes): Int = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val degenerate = SaneEstimateBytes.min(
      BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes))
    if (est <= 0 || est >= degenerate)
      df.sparkSession.sessionState.conf.numShufflePartitions
    else
      forBytes(df.sparkSession,
        est * math.max(1L, math.round(expansion * 100)) / 100,
        targetPartitionBytes)
  }

  /** [[forBytes]] from a row count and estimated row width — for call
    * sites that already paid a count (e.g. a checkpoint-materializing
    * action) and know their row shape. */
  def forRows(spark: SparkSession, rows: Long, bytesPerRow: Long): Int =
    forBytes(spark, BigInt(rows) * bytesPerRow)

  /** Operator-OWNED width: the bytes rule with NO session floor — one
    * partition per [[TargetPartitionBytes]], clamped to [1, [[MaxWidth]]].
    *
    * The session-floor rule above is right when the session width IS a
    * parallelism choice (~cores). It is wrong in both directions for the
    * case §2.9.16 #1 measured: a session width sized as a GLOBAL rows
    * rule for the caller's biggest exchange (2,520–8,000 partitions at
    * the 10⁷-doc battery decades) is quadratically oversized for an
    * operator-internal exchange whose record count is bounded by a TYPE
    * space — map_tasks × reduce_width ≈ 64M zstd segments carrying ~2
    * records each, 5–7.5× reduce CPU for 1.2× records (the kn_perplexity
    * 1,705 s shape; the §2.9.12 segment law's third appearance). And a
    * CORE-count floor is itself oversized at fixture scale: a pinned
    * 32-task exchange of a few thousand rows pays 32 task launches where
    * AQE's coalescer would have run 1 (measured +35 task-sec across the
    * two gate kn queries). One task per 64 MB makes the cores busy
    * exactly when there is data to fill them, which is the same target
    * AQE's advisory coalescing aims at — but decided from the operator's
    * own volume model, immune to the session conf. Degenerate estimates
    * fall back to the SESSION width exactly as [[forExchange]] does —
    * estimator failure must not shrink a deliberately-wide session. */
  def ownedForBytes(spark: SparkSession, bytesEstimate: BigInt,
                    targetPartitionBytes: Long = TargetPartitionBytes): Int =
    // floor 2, not 1: a 1-partition HashPartitioning cannot anchor join
    // co-partitioning (ShuffleSpec.canCreatePartitioning special-cases
    // single-partition), so EnsureRequirements would ignore the pin and
    // re-exchange BOTH join sides at the session width — the exact
    // inheritance the owned width exists to break
    (bytesEstimate / targetPartitionBytes).min(MaxWidth).max(2).toInt

  /** [[ownedForBytes]] from the frame's own Catalyst size estimate — the
    * [[forExchange]] twin (same Generate-expansion correction, same
    * degenerate-estimate guards and the same join-derived-frame caveat),
    * with the operator-owned floor.
    *
    * `degenerateWidth` (ADVICE r15): what a DEGENERATE estimate falls back
    * to. The default (< 1) keeps the historical session-width fallback —
    * right when no better volume model exists. A caller holding a COUNTED
    * width for a sibling frame (kn's train side) passes it instead: a
    * stat-less score frame must not re-inherit the session width into
    * every pinned model-table exchange — the exact pathology the owned
    * width exists to break. */
  def ownedForExchange(df: DataFrame, expansion: Double = 1.0,
                       targetPartitionBytes: Long = TargetPartitionBytes,
                       degenerateWidth: Int = -1): Int = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val degenerate = SaneEstimateBytes.min(
      BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes))
    if (est <= 0 || est >= degenerate) {
      if (degenerateWidth >= 1) degenerateWidth
      else df.sparkSession.sessionState.conf.numShufflePartitions
    } else
      ownedForBytes(df.sparkSession,
        est * math.max(1L, math.round(expansion * 100)) / 100,
        targetPartitionBytes)
  }
}
