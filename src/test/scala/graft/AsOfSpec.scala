package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** As-of join semantics on hand fixtures: greatest right time ≤ left time
  * per key, ties resolve right-first (≤, the DuckDB default), no prior row
  * → null, keys never cross. */
class AsOfSpec extends SparkSpec {

  test("asofJoin picks the greatest right time at-or-before each left row per key") {
    import spark.implicits._
    val trades = Seq( // (key, t, trade id)
      ("a", 10L, 1L), ("a", 25L, 2L), ("a", 30L, 3L),
      ("b", 5L, 4L), ("c", 50L, 5L)
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq( // (key, t, px)
      ("a", 8L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
      ("b", 6L, 9.0) // after b's only trade → no match
    ).toDF("sym", "qt", "px")
    val got = AsOf.asofJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .select("trade_id", "qt_asof", "px_asof").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(got(1L) == (Some(8L), Some(1.0)), "10 → quote@8")
    assert(got(2L) == (Some(20L), Some(2.0)), "25 → quote@20")
    assert(got(3L) == (Some(30L), Some(3.0)), "tie: equal time matches (<=)")
    assert(got(4L) == (None, None), "no quote at-or-before 5")
    assert(got(5L) == (None, None), "key c has no quotes at all")
  }

  test("intervalJoin equals the brute-force range predicate, boundaries exact") {
    import graft.operators.IntervalJoin
    import spark.implicits._
    // deterministic irregular times; windows straddle bucket boundaries
    val left = (1 to 200).map(i => ((i % 5).toString, (i * 37L) % 1000, i.toLong))
      .toDF("k", "t", "lid").repartition(4)
    val right = (1 to 300).map(i => ((i % 5).toString, (i * 53L) % 1000, 1000L + i))
      .toDF("k", "rt", "rid").repartition(4)
    val got = IntervalJoin.intervalJoin(left, right, Seq("k"), "t", "rt",
        Seq("rid"), 0L, 100L)
      .select("lid", "rid_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = left.as("l").join(right.as("r"), col("l.k") === col("r.k") &&
        col("r.rt") > col("l.t") && col("r.rt") <= col("l.t") + 100L)
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture must produce matches")
    assert(got == brute, s"bucketed ${got.size} vs brute ${brute.size}")
    // exclusive lower bound: an exactly-equal time must NOT match
    val l1 = Seq(("a", 100L, 1L)).toDF("k", "t", "lid")
    val r1 = Seq(("a", 100L, 9L), ("a", 200L, 8L), ("a", 201L, 7L))
      .toDF("k", "rt", "rid")
    val edge = IntervalJoin.intervalJoin(l1, r1, Seq("k"), "t", "rt",
        Seq("rid"), 0L, 100L)
      .select("rid_r").collect().map(_.getLong(0)).toSet
    assert(edge == Set(8L), "(t, t+100]: rt=100 excluded, rt=200 included, rt=201 out")
  }

  test("asofJoin preserves every left row and column across a shuffle-width input") {
    import spark.implicits._
    val left = (1 to 500).map(i => ((i % 7).toString, i.toLong, s"p$i"))
      .toDF("k", "t", "payload").repartition(8)
    val right = (1 to 100).map(i => ((i % 7).toString, (i * 5).toLong, i.toDouble))
      .toDF("k", "rt", "v").repartition(8)
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
    assert(out.count() == 500, "left-join cardinality: one row per left row")
    assert(out.columns.toSet ==
      Set("k", "t", "payload", "rt_asof", "v_asof"))
    // spot-check the invariant everywhere: matched right time <= left time
    assert(out.filter(col("rt_asof") > col("t")).count() == 0)
    // and it is the GREATEST such: no other right row between them
    val viol = out.as("o").join(right.as("r"),
        col("o.k") === col("r.k") && col("r.rt") <= col("o.t") &&
          col("r.rt") > col("o.rt_asof"))
    assert(viol.count() == 0, "a later eligible right row was skipped")
  }
}
