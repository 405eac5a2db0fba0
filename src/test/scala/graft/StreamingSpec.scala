package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Ev, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Drives the streaming operators with MemoryStream — real incremental
  * execution with state across triggers, no external source needed. */
class StreamingSpec extends SparkSpec {

  test("streaming sessionize: sessions close across trigger batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 — two events 10 min apart (one open session)
      input.addData(Ev(1L, 1L, 0L, 1.0), Ev(1L, 2L, 600000L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0) // still open
      // batch 2: 40 min later → closes session 1, opens session 2
      input.addData(Ev(1L, 3L, 600000L + 2400000L, 5.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out").as[SessionOut].collect()
      assert(rows.length === 1)
      val s = rows.head
      assert(s.session_num === 1L && s.n_events === 2L
        && s.duration_ms === 600000L && s.sum_value === 3.0)
    } finally q.stop()
  }

  test("stream-stream interval join emits bounded-window pairs across batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val lIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val rIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = EventStreams.intervalJoinStream(
      lIn.toDS().toDF("user_id", "view_id", "ltime"),
      rIn.toDS().toDF("r_user_id", "click_id", "rtime"),
      Seq("user_id"), 0L, 3600L)
    val q = joined.select("user_id", "view_id", "click_id")
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: u1 view@10:00; clicks at 10:30 (in), 10:00 (boundary:
      // rtime > ltime is strict → out), 11:30 (past 1h → out); u2 click
      // with no view → out
      lIn.addData((1L, 1L, t("2024-01-01 10:00:00")))
      rIn.addData((1L, 11L, t("2024-01-01 10:30:00")),
        (1L, 12L, t("2024-01-01 10:00:00")),
        (1L, 13L, t("2024-01-01 11:30:00")),
        (2L, 14L, t("2024-01-01 10:30:00")))
      q.processAllAvailable()
      assert(spark.table("ssj_out").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === Set((1L, 1L, 11L)))
      // batch 2: a click arriving later still matches the BUFFERED view —
      // the stream-state behavior the batch operator can't provide
      rIn.addData((1L, 15L, t("2024-01-01 10:45:00")))
      q.processAllAvailable()
      assert(spark.table("ssj_out").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ===
        Set((1L, 1L, 11L), (1L, 1L, 15L)))
    } finally q.stop()
  }

  test("checkpointed file-source stream resumes exactly-once across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (inDir, outDir, ckDir) = (s"$root/in", s"$root/out", s"$root/ck")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val spark0 = spark
    import spark0.implicits._
    def land(ids: Seq[Long], file: String): Unit =
      ids.map(i => (i, s"e$i")).toDF("event_id", "event_type")
        .coalesce(1).write.mode("append").parquet(s"$inDir/$file")
    def runOnce(): Unit = {
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType)))
      val q = spark.readStream.schema(sch)
        .option("recursiveFileLookup", "true").parquet(inDir)
        .select(col("event_id"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    land(Seq(1L, 2L, 3L), "f1")
    runOnce()
    assert(spark.read.parquet(outDir).count() === 3)
    // restart with nothing new: the checkpoint's source log prevents any
    // reprocessing — the operational exactly-once contract
    runOnce()
    assert(spark.read.parquet(outDir).count() === 3)
    // late-landing file: only IT is processed on the next restart
    land(Seq(4L, 5L), "f2")
    runOnce()
    val out = spark.read.parquet(outDir)
    assert(out.count() === 5)
    assert(out.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("streaming hourly aggregates with watermark produce windowed counts") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDS().toDF("ts", "event_type", "value")
    val q = EventStreams.hourlyAggregates(df)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((t("2024-01-01 10:15:00"), "click", 1.0),
        (t("2024-01-01 10:45:00"), "click", 2.0),
        (t("2024-01-01 11:30:00"), "view", 4.0))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 window
      input.addData((t("2024-01-01 14:00:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out").collect()
      val tenOclock = rows.find(r => r.getAs[java.sql.Timestamp]("hour_start")
        .toString.startsWith("2024-01-01 10"))
      assert(tenOclock.isDefined)
      assert(tenOclock.get.getAs[Long]("n") === 2L)
      assert(tenOclock.get.getAs[Double]("sum_value") === 3.0)
    } finally q.stop()
  }

  test("batch closeOpenSessions matches the batch sessionize query semantics") {
    val spark0 = spark
    import spark0.implicits._
    val evs = Seq(Ev(7L, 1L, 0L, 1.0), Ev(7L, 2L, 100L, 1.0)).toDS()
    val out = EventStreams.closeOpenSessions(evs).collect()
    assert(out.length === 1 && out.head.n_events === 2L)
  }

  test("streaming dedup keeps the first record per digest within the watermark") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDS().toDF("ts", "digest", "value")
    val q = EventStreams.dedupStream(df, Seq("digest"), "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        (t("2024-01-01 10:00:00"), "a", 1.0),
        (t("2024-01-01 10:05:00"), "a", 2.0), // dup within watermark → dropped
        (t("2024-01-01 10:10:00"), "b", 3.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.length === 2, s"expected 2 distinct digests, got ${rows.length}")
      assert(rows.map(_.getAs[String]("digest")).toSet === Set("a", "b"))
    } finally q.stop()
  }
}
