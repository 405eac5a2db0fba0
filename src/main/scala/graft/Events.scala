package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Events-tier facade — the behavioral-analytics twin of [[Corpus]] (docs)
  * and [[Forecaster]] (series): one immutable wrapper over an events frame
  * with `ts` canonicalized to epoch-ns LONG ([[graft.core.Tables.events]]),
  * exposing the oracle-checked analytics as chainable calls. Each method is
  * the facade form of a declared `events_*` query, so its semantics are the
  * hash-verified ones; the streaming twins live in
  * [[graft.streaming.EventStreams]].
  *
  * Required columns: (event_id LONG, ts LONG epoch-ns, user_id LONG,
  * event_type STRING, value DOUBLE); `props` optional.
  */
final case class Events(events: DataFrame) {
  {
    val missing = Seq("event_id", "ts", "user_id", "event_type", "value")
      .filterNot(events.columns.contains)
    require(missing.isEmpty,
      s"Events frame is missing column(s) ${missing.mkString(", ")} — " +
        "read through graft.core.Tables.events (it canonicalizes ts to " +
        "epoch-ns LONG) or supply them directly")
    require(events.schema("ts").dataType == org.apache.spark.sql.types.LongType,
      "Events.ts must be epoch-ns LONG — Tables.normalizeEventTs converts " +
        "timestamp/nanos encodings")
  }

  private def hourMs: Column = expr("(ts div 3600000000000) * 3600000")

  /** Per-hour, per-type counts/sums (events_hourly). */
  /** Values carry exactly 2 decimals, so sums/averages go through INTEGER
    * CENTS: a raw double sum's order-dependent last ulp can straddle the
    * ROUND half-boundary against another engine's sum (one avg_value cell
    * flipped at sf0.1); cents → the division is one exact integer over
    * (100·n) on every engine. */
  def hourly: DataFrame = {
    val cents = sum(round(col("value") * 100, 0).cast("long"))
    events.groupBy(hourMs.as("hour_ms"), col("event_type"))
      .agg(count(lit(1)).as("n"), cents.as("_c"))
      .select(col("hour_ms"), col("event_type"), col("n"),
        round(col("_c") / 100.0, 4).as("sum_value"),
        round(col("_c") / 100.0 / col("n"), 6).as("avg_value"))
  }

  /** Gap-based numbered sessions (events_sessionize): 30-minute default. */
  def sessionize(gapMs: Long = 1800000L): DataFrame = {
    val uw = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = events
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(uw))
      .withColumn("new_s",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_num", sum(col("new_s")).over(
        uw.rowsBetween(Window.unboundedPreceding, 0)))
    ev.groupBy(col("user_id"), col("session_num"))
      .agg(count(lit(1)).as("n_events"), min(col("ms")).as("start_ms"),
        (max(col("ms")) - min(col("ms"))).as("duration_ms"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** Top length-`n` event-type paths within sessions (events_top_paths):
    * sessions numbered by the [[sessionize]] gap rule, every contiguous
    * n-event subsequence counted corpus-wide, top `k` by count (ties on
    * the path string). The path build is a lead-window over the session
    * partition — no per-session collect; the count aggregate's key space
    * is bounded by |event_type|ⁿ, so the final rank runs over a tiny
    * frame. The monitoring view behind "what do users do right before
    * purchase/error". */
  def topPaths(n: Int = 3, k: Int = 10, gapMs: Long = 1800000L): DataFrame = {
    require(n >= 2, "a path needs at least 2 steps")
    val uw = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = events
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(uw))
      .withColumn("new_s",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_num", sum(col("new_s")).over(
        uw.rowsBetween(Window.unboundedPreceding, 0)))
    val sw = Window.partitionBy("user_id", "session_num")
      .orderBy(col("ms"), col("event_id"))
    val steps = col("event_type") +:
      (1 until n).map(i => lead(col("event_type"), i).over(sw))
    val paths = ev
      .withColumn("_pN", lead(col("event_type"), n - 1).over(sw))
      .withColumn("path", concat_ws(">", steps: _*))
      .filter(col("_pN").isNotNull)
      .groupBy("path").agg(count(lit(1)).as("n_occurrences"))
    paths.withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("path"))))
      .filter(col("rank") <= k)
      .select(col("rank").cast("long").as("rank"), col("path"),
        col("n_occurrences"))
  }

  /** Windowed conversion funnel (events_funnel): each next stage's earliest
    * qualifying event strictly after the previous stage's time and within
    * `windowNs` of it. Output: (stage, n_users). */
  def funnel(stages: Seq[String], windowNs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = events.select(col("user_id"), col("ts"), col("event_type"))
    val head = e.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    val frames = stages.tail.scanLeft(head) { (prev, stage) =>
      e.filter(col("event_type") === stage).join(prev, "user_id")
        .filter(col("ts") > col("t") && col("ts") <= col("t") + lit(windowNs))
        .groupBy("user_id").agg(min("ts").as("t"))
    }
    stages.zip(frames).map { case (name, df) =>
      df.agg(count(lit(1)).as("n_users")).withColumn("stage", lit(name))
    }.reduce(_ union _).select(col("stage"), col("n_users"))
  }

  /** First-seen cohort retention matrix (events_retention). */
  def retention(maxOffsetDays: Int = 7): DataFrame = {
    val ed = events
      .select(col("user_id"), expr("(ts div 86400000000000) * 86400000").as("day_ms"))
      .distinct()
    val c = ed.groupBy("user_id").agg(min("day_ms").as("c0"))
    ed.join(c, "user_id")
      .withColumn("day_offset", expr("(day_ms - c0) div 86400000"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("c0").as("cohort_ms"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Hourly heavy hitters via the bounded [[graft.functions.TopKPairs]]
    * aggregate (events_topk_users): shuffle volume = hours × k. */
  def topUsers(k: Int): DataFrame = {
    import graft.functions.TopK
    events.groupBy(hourMs.as("hour_ms"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("hour_ms"))
      .agg(TopK.topkPairs(col("n"), col("user_id"), k).as("top"))
      .select(col("hour_ms"), inline(col("top")))
      .select(col("hour_ms"), col("rank"), col("id").as("user_id"),
        col("w").as("n"))
  }

  /** Per-hour distinct-user KMV estimate next to the exact count
    * (events_kmv_users). */
  def distinctUsersByHour(k: Int = 16): DataFrame = {
    import graft.functions.KmvSketch
    events
      .select(hourMs.as("hour_ms"), KmvSketch.hash60(col("user_id")).as("h"))
      .groupBy("hour_ms")
      .agg(countDistinct(col("h")).as("n_exact"),
        round(KmvSketch.kmvDistinct(col("h"), k), 6).as("n_est"))
  }

  /** Per-type value quantiles from the deterministic k-smallest-hash
    * sample (events_value_sketch). */
  def valueQuantileSketch(k: Int = 64,
                          pcts: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    import graft.functions.KmvSketch
    val base = events
      .select(col("event_type"), KmvSketch.hash60(col("event_id")).as("h"),
        col("value"))
      .groupBy("event_type")
      .agg(KmvSketch.hashSample(col("h"), col("value"), k).as("sample"))
      .select(col("event_type"), explode(col("sample")).as("v"))
      .groupBy("event_type")
    val aggs = count(lit(1)).as("n_sample") +:
      pcts.map(p => round(expr(s"percentile(v, $p)"), 6)
        .as(s"p${(p * 100).round}_est"))
    base.agg(aggs.head, aggs.tail: _*)
  }

  /** Trailing-window volume anomaly flags (events_anomaly). */
  def anomalies(windowHours: Int = 24, zThreshold: Double = 3.0): DataFrame = {
    val hourly = events.groupBy(hourMs.as("hour_ms")).agg(count(lit(1)).as("n"))
    val w = Window.orderBy("hour_ms").rowsBetween(-windowHours, -1)
    hourly
      .withColumn("_mu", avg(col("n")).over(w))
      .withColumn("_sd", stddev_samp(col("n").cast("double")).over(w))
      .withColumn("_cnt", count(col("n")).over(w))
      .filter(col("_cnt") === windowHours && col("_sd") > 0)
      .withColumn("z", round((col("n") - col("_mu")) / col("_sd"), 6))
      .select(col("hour_ms"), col("n"), col("z"),
        (abs(col("z")) >= zThreshold).as("is_anomaly"))
  }

  /** Rolling-median level-shift detection (events_level_shift) — the
    * monitoring twin of [[anomalies]]: a z-score flags single spiky hours,
    * this flags SUSTAINED level changes. Per hour: median hourly volume
    * over the trailing `windowHours` vs over the window starting at the
    * current hour; a shift fires when the relative change of the (robust)
    * medians reaches `minRel`. Pure window SQL over the reduced hourly
    * frame — bounded state, exactly replayable by the DuckDB oracle
    * (quantile_cont twin). Windows are ROW windows over OBSERVED hours
    * (like [[anomalies]]): hours with zero events are absent from the
    * hourly frame, so across a quiet gap a "trailing windowHours" window
    * spans a longer calendar range, and a drop TO zero volume can only be
    * seen from the surviving hours around it — densify upstream if true
    * calendar windows are needed. Edge hours without both full windows are
    * excluded (no partial-window false fires). */
  def levelShifts(windowHours: Int = 24, minRel: Double = 0.25): DataFrame = {
    val hourly = events.groupBy(hourMs.as("hour_ms")).agg(count(lit(1)).as("n"))
    val pre = Window.orderBy("hour_ms").rowsBetween(-windowHours, -1)
    val post = Window.orderBy("hour_ms").rowsBetween(0, windowHours - 1)
    hourly
      .withColumn("pre_med", expr("percentile(n, 0.5)").over(pre))
      .withColumn("post_med", expr("percentile(n, 0.5)").over(post))
      .withColumn("_nc", count(col("n")).over(pre) + count(col("n")).over(post))
      .filter(col("_nc") === 2 * windowHours && col("pre_med") > 0)
      .withColumn("shift_score",
        round((col("post_med") - col("pre_med")) / col("pre_med"), 6))
      .select(col("hour_ms"), col("n"), round(col("pre_med"), 6).as("pre_med"),
        round(col("post_med"), 6).as("post_med"), col("shift_score"),
        (abs(col("shift_score")) >= minRel).as("is_shift"))
  }

  /** Most recent at-or-before right-side row per key (events_asof_view
    * shape) — [[graft.operators.AsOf.asofJoin]] on this frame. */
  def asofJoin(right: DataFrame, keys: Seq[String], leftTs: String,
               rightTs: String, payload: Seq[String]): DataFrame =
    graft.operators.AsOf.asofJoin(events, right, keys, leftTs, rightTs, payload)

  /** Bounded-window pair join (events_interval_join shape) —
    * [[graft.operators.IntervalJoin.intervalJoin]] on this frame. */
  def intervalJoin(right: DataFrame, keys: Seq[String], leftTs: String,
                   rightTs: String, payload: Seq[String],
                   loNs: Long, hiNs: Long): DataFrame =
    graft.operators.IntervalJoin.intervalJoin(events, right, keys, leftTs,
      rightTs, payload, loNs, hiNs)
}
