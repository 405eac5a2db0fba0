package graft
import org.apache.spark.sql.SparkSession

object KnProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        names.put(e.stageInfo.stageId, e.stageInfo.name.take(60))
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val a = stages.computeIfAbsent(te.stageId, _ => new Array[Long](5))
          a.synchronized {
            a(0) += m.executorRunTime; a(1) += m.executorCpuTime / 1000000L
            a(2) += m.shuffleWriteMetrics.recordsWritten
            a(3) += m.shuffleReadMetrics.recordsRead
            a(4) += 1
          }
        }
      }
    })
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, d)
    val t0 = System.nanoTime()
    graft.functions.TextOps.knPerplexity(docs, docs, "doc_id")
      .write.mode("overwrite").format("noop").save()
    println(f"wall=${(System.nanoTime()-t0)/1e9}%.2f")
    Thread.sleep(1200)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2(0)).take(15).foreach { case (id, a) =>
      println(f"stage=$id%4d task_ms=${a(0)}%8d cpu_ms=${a(1)}%8d swr=${a(2)}%9d srr=${a(3)}%9d tasks=${a(4)}%5d  ${names.getOrDefault(id, "?")}")
    }
    spark.stop()
  }
}
