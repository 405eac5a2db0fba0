package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan probing for performance work (not part of the contract).
  * Current probe: why the 4-consumer shingle exchange in jaccardPairs
  * stops being reused at the BenchScale points. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val coalesce = args.headOption.contains("coalesce")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "80")
      .config("spark.memory.storageFraction", "0.2")
      .config("spark.sql.adaptive.coalescePartitions.enabled", coalesce.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = BenchScale.syntheticDocs(spark, 200000L)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    docs.write.mode("overwrite").format("noop").save()
    val out = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8, 100)
    val t0 = System.nanoTime()
    val ep = out.queryExecution.executedPlan
    ep.execute().count() // materialize THIS execution so AQE finalizes it
    println(f"TIMER jaccard ${(System.nanoTime() - t0) / 1e9}%.2f s coalesce=$coalesce")
    val plan = ep.toString
    println("ReusedExchange occurrences: " + "ReusedExchange".r.findAllIn(plan).size)
    println("Exchange occurrences: " + "Exchange".r.findAllIn(plan).size)
    println(plan.take(12000))
    spark.stop()
  }
}
