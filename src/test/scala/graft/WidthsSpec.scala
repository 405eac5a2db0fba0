package graft

import graft.core.Widths

/** Pins the bytes-proportional reduce-width rule (§2.9.12, promoted from
  * the scale battery): session width is a hard floor (fixture-scale plans
  * stay byte-identical), width grows with the exchange-bytes estimate at
  * [[Widths.TargetPartitionBytes]] per partition, and the battery's 8192
  * cap bounds scheduler/file pressure. */
class WidthsSpec extends SparkSpec {

  test("forBytes: session floor, bytes scaling, cap") {
    val session = spark.sessionState.conf.numShufflePartitions
    // below one target partition → the session width, untouched
    assert(Widths.forBytes(spark, BigInt(1)) == session)
    assert(Widths.forBytes(spark, BigInt(Widths.TargetPartitionBytes)) == session)
    // grows linearly once past session × target
    val grown = Widths.forBytes(spark,
      BigInt(Widths.TargetPartitionBytes) * (session + 64))
    assert(grown == session + 64)
    // capped at the battery's 8192
    assert(Widths.forBytes(spark,
      BigInt(Widths.TargetPartitionBytes) * 1000000) == Widths.MaxWidth)
    assert(Widths.forRows(spark, 1000L, 10L) == session)
  }

  test("forExchange: fixture-scale frames keep the session width") {
    import spark.implicits._
    val tiny = (1 to 100).map(i => (i.toLong, s"doc $i text")).toDF("doc_id", "text")
    assert(Widths.forExchange(tiny) == spark.sessionState.conf.numShufflePartitions)
  }

  test("forExchange: a stat-less leaf's sentinel estimate falls back to the session width") {
    import spark.implicits._
    val session = spark.sessionState.conf.numShufflePartitions
    // an RDD-backed frame has no leaf statistics: Catalyst reports
    // spark.sql.defaultSizeInBytes (Long.MaxValue) — without the guard a
    // 100-row frame would size every consumer at MaxWidth (8192 tasks)
    val rddBacked = spark.createDataFrame(
      spark.sparkContext.parallelize((1 to 100).map(i =>
        org.apache.spark.sql.Row(i.toLong, s"doc $i"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val est = rddBacked.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(est >= BigInt(spark.sessionState.conf.defaultSizeInBytes),
      s"precondition: the RDD-backed leaf should report the sentinel, got $est")
    assert(Widths.forExchange(rddBacked) == session)
    // even a huge expansion multiplier cannot resurrect the sentinel
    assert(Widths.forExchange(rddBacked, expansion = 100.0) == session)
    // a Project above the leaf SCALES the sentinel by the width ratio —
    // huge-but-finite garbage an exact-sentinel compare would miss; the
    // SaneEstimateBytes ceiling must still catch it (this is exactly the
    // spanLeakageMatrix call shape: docs.select(textCol))
    val projected = rddBacked.select(org.apache.spark.sql.functions.col("text"))
    val estP = projected.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(estP >= Widths.SaneEstimateBytes,
      s"precondition: the projected sentinel should still be absurd, got $estP")
    assert(Widths.forExchange(projected) == session)
    assert(Widths.forExchange(projected, expansion = 10.0) == session)
  }

  test("ownedForBytes: pure bytes rule — no session or core floor, same cap") {
    // a tiny exchange gets the 2-partition floor (a 1-partition hash
    // layout cannot anchor join co-partitioning) — not a session width
    // somebody sized for a different operator's volume (the §2.9.16 kn
    // lesson: a rows-rule width of 8,000 must not leak into a type-table
    // exchange) and not a core floor either (32 task launches for a few
    // thousand rows is the same overhead class AQE coalescing exists to
    // remove)
    assert(Widths.ownedForBytes(spark, BigInt(1)) == 2)
    // grows with bytes exactly like forBytes
    assert(Widths.ownedForBytes(spark,
      BigInt(Widths.TargetPartitionBytes) * 96) == 96)
    // same battery cap
    assert(Widths.ownedForBytes(spark,
      BigInt(Widths.TargetPartitionBytes) * 1000000) == Widths.MaxWidth)
  }

  test("ownedForExchange: degenerate estimates fall back to the session width") {
    import spark.implicits._
    val tiny = (1 to 100).map(i => (i.toLong, s"doc $i text")).toDF("doc_id", "text")
    assert(Widths.ownedForExchange(tiny) == 2)
    // estimator failure must not SHRINK a deliberately-wide session: the
    // sentinel path falls back to the session width, as forExchange does
    val rddBacked = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
    assert(Widths.ownedForExchange(rddBacked) ==
      spark.sessionState.conf.numShufflePartitions)
  }

  test("knPerplexity pins its model-table exchanges at the owned width, not the session's") {
    import spark.implicits._
    // an OVERSIZED session width (the rows-rule battery shape): the
    // operator's internal exchanges must not inherit it — §2.9.16 #1
    // measured 64M two-record zstd segments and a 4.7× wall when they did
    val oldWidth = spark.sessionState.conf.numShufflePartitions
    val oldBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ tier
    try {
      val docs = (1 to 200).map(i =>
        (i.toLong, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 5} w${i % 3} end"))
        .toDF("doc_id", "text")
      val out = graft.functions.TextOps.knPerplexity(docs, docs, "doc_id")
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
      val pinned = "REPARTITION_BY_NUM".r.findAllIn(plan).size
      assert(pinned >= 3, s"expected the model-table pins in the plan:\n$plan")
      // no pinned exchange may carry the oversized session width
      assert(!plan.contains(", 512), REPARTITION_BY_NUM"),
        s"an operator-owned exchange inherited the session width:\n$plan")
      // and in the SMJ tier the score-side ENSURE exchanges are sized by
      // the model layouts (the owned width — the 2-partition floor at
      // this fixture size), not by the session conf — allow only the
      // doc-keyed aggregates on the session width
      val sessionWide = "hashpartitioning\\([^)]*, 512\\)".r
        .findAllIn(plan).size
      val sessionWideDoc = "hashpartitioning\\((doc|doc_id)[^)]*, 512\\)".r
        .findAllIn(plan).size
      assert(sessionWide == sessionWideDoc,
        s"a gram/type exchange inherited the session width:\n$plan")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", oldWidth.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
  }
}
