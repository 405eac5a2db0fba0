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
}
