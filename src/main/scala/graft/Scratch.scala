package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan probing for performance work (not part of the contract).
  * Current probe: which shuffle-map stages doc_curation_chain materializes
  * (the PlanPin +4 after the keyed-checkpoint change). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    SparkEntry.prewarmMemos(spark, sfDir)
    val q = args.headOption.getOrElse("doc_curation_chain")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && m.shuffleWriteMetrics.bytesWritten > 0)
          stages.merge(te.stageId, (te.taskInfo.taskLocality.toString, m.shuffleWriteMetrics.bytesWritten),
            (a, b) => (a._1, a._2 + b._2))
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (stages.containsKey(s.stageInfo.stageId))
          stages.put(s.stageInfo.stageId, (s.stageInfo.name, stages.get(s.stageInfo.stageId)._2))
    })
    SparkEntry.queries(q)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    Thread.sleep(800)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (sid, (name, sw)) =>
      println(s"STAGE $sid sw=${sw}B  ${name.linesIterator.next()}")
    }
    println(s"STAGETOTAL ${stages.size}")
    spark.stop()
  }
}
