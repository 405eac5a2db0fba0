package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Events facade ([[graft.Events]]): the declared events_* queries pin the
  * default parameterizations against DuckDB; this spec exercises the
  * GENERALIZED parameters (custom funnel stages, gap, window, k) on a
  * hand-computed fixture. */
class EventsSpec extends SparkSpec {

  /** (event_id, minute-offset, user, type, value) → canonical events frame
    * with ts in epoch-ns. */
  private def ev(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    val t0 = 1699999200000000000L // epoch-ns base, hour-aligned (÷3600 s)
    rows.map { case (id, minute, u, t, v) =>
      (id, t0 + minute * 60L * 1000 * 1000 * 1000, u, t, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("two-stage funnel with a custom window binds on the gap") {
    val e = ev(Seq(
      (1L, 0L, 1L, "a", 1.0), (2L, 5L, 1L, "b", 1.0),   // within 10 min
      (3L, 0L, 2L, "a", 1.0), (4L, 30L, 2L, "b", 1.0),  // outside 10 min
      (5L, 0L, 3L, "b", 1.0)))                          // b with no a
    val out = Events(e).funnel(Seq("a", "b"), 10L * 60 * 1000 * 1000 * 1000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 2L, "b" -> 1L))
  }

  test("sessionize honors a custom gap") {
    val e = ev(Seq(
      (1L, 0L, 1L, "x", 1.0), (2L, 4L, 1L, "x", 2.0), (3L, 20L, 1L, "x", 3.0)))
    val five = Events(e).sessionize(gapMs = 5L * 60 * 1000).collect()
    assert(five.length === 2, "5-minute gap splits the 20-minute jump")
    val hour = Events(e).sessionize(gapMs = 60L * 60 * 1000).collect()
    assert(hour.length === 1 && hour.head.getAs[Long]("n_events") === 3L)
  }

  test("topPaths counts within-session n-grams and never crosses a session gap") {
    val e = ev(Seq(
      (1L, 0L, 1L, "a", 1.0), (2L, 1L, 1L, "b", 1.0), (3L, 2L, 1L, "c", 1.0),
      // 40-minute gap: new session — c>d must NOT appear
      (4L, 42L, 1L, "d", 1.0), (5L, 43L, 1L, "e", 1.0),
      (6L, 0L, 2L, "a", 1.0), (7L, 1L, 2L, "b", 1.0)))
    val p2 = Events(e).topPaths(n = 2, k = 10)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(p2 === Map("a>b" -> 2L, "b>c" -> 1L, "d>e" -> 1L))
    val p3 = Events(e).topPaths(n = 3, k = 10)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(p3 === Map("a>b>c" -> 1L))
    // rank 1 is the modal path
    val r1 = Events(e).topPaths(n = 2, k = 1).collect().head
    assert(r1.getLong(0) === 1L && r1.getString(1) === "a>b")
  }

  test("topUsers k and anomalies window parameterize correctly") {
    val e = ev((1L to 20L).map(i => (i, i % 3, i % 4, "x", 1.0)))
    val top = Events(e).topUsers(2)
    // per hour (all in one hour here): exactly 2 rows, rank 1..2
    assert(top.count() === 2 &&
      top.select("rank").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // anomalies: a 3-hour trailing window over a 5-hour spike fixture
    val hours = ev((0L until 300L).map { i =>
      val minute = i / 60 * 60 + i % 60 // one event per minute, 5 hours
      (i + 1, minute, 1L, "x", 1.0)
    })
    val flags = Events(hours).anomalies(windowHours = 3, zThreshold = 3.0)
    // constant volume → sd = 0 in every full window → no rows survive
    assert(flags.count() === 0)
  }

  test("levelShifts flags a sustained volume step, not a single spike") {
    // 12 hours: 6 at 10 events/hour, then 6 at 20 — a 2× sustained step.
    // window=3: the step hour sees pre_med=10, post_med=20 → score 1.0
    val step = ev((0L until 180L).map { i =>
      val hour = i / 15; val within = i % 15
      val reps = if (hour >= 6) 2L else 1L
      (i + 1, hour * 60 + within * (4 / reps), 1L, "x", 1.0)
    } ++ (0L until 90L).map { i => // the extra 15/hour for hours 6..11
      val hour = 6 + i / 15
      (1000L + i, hour * 60 + (i % 15) * 2 + 1, 2L, "x", 1.0)
    })
    val out = Events(step).levelShifts(windowHours = 3, minRel = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(4), r.getBoolean(5)))
    assert(out.nonEmpty, "interior hours must have both full windows")
    val fired = out.filter(_._3)
    assert(fired.nonEmpty, "the sustained step must fire")
    // the maximal score is exactly the 2× step seen from the boundary hour
    assert(math.abs(out.map(_._2).max - 1.0) < 1e-9)
    // flat stretch far from the boundary: no fire
    assert(out.minBy(_._1)._3 === false)
  }
}
