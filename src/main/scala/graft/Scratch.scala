package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan probing for performance work (not part of the contract).
  * Current probe: driver-side job counts + wall for the driver-latency
  * query class (wall ≫ task/cores — VERDICT r15 #4/#5). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val verbose = sys.env.get("SPARK_GRAFT_PROBE_VERBOSE").contains("1")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
          System.err.println(s"[job] ${e.jobId} stages=${e.stageInfos.size} $site")
        }
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.prewarmMemos(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "ts_opt_transform", "ts_opt_transform_by_series", "mv_blocked_dynamic",
      "ts_model_summaries", "ts_cv_rolling", "ts_conformal", "mv_vecm",
      "mv_screen_approx", "mv_dynamic", "mv_star_fit", "mv_backtest",
      "ts_reconcile", "ts_synthesize", "ts_sarma")
    names.foreach { n =>
      (1 to 2).foreach { i =>
        org.apache.spark.GraftBus.drain(spark.sparkContext)
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftBus.drain(spark.sparkContext)
        println(f"[probe] $n run$i wall=$sec%.3f jobs=${jobs.get() - j0}")
      }
    }
    spark.stop()
  }
}
