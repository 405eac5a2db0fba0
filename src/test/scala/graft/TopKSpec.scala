package graft

import graft.functions.TopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded top-k aggregate ([[graft.functions.TopKPairs]]): equality with
  * the rank-window idiom it replaces, partition invariance (the map-side
  * partial contract), tie order, and under-full groups. */
class TopKSpec extends SparkSpec {

  private def pairs(rows: Seq[(String, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("g", "w", "id")
  }

  private def viaAgg(df: DataFrame, k: Int): Set[(String, Long, Long, Long)] =
    df.groupBy("g").agg(TopK.topkPairs(col("w"), col("id"), k).as("top"))
      .select(col("g"), inline(col("top")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def viaWindow(df: DataFrame, k: Int): Set[(String, Long, Long, Long)] =
    df.withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("w").desc, col("id"))))
      .filter(col("rank") <= k)
      .collect().map(r => (r.getString(0), r.getAs[Int]("rank").toLong,
        r.getAs[Long]("id"), r.getAs[Long]("w"))).toSet

  test("topk agg equals the rank-window form incl. weight ties") {
    val df = pairs(Seq(
      ("a", 5L, 10L), ("a", 5L, 3L), ("a", 7L, 8L), ("a", 1L, 1L), ("a", 5L, 2L),
      ("b", 2L, 9L), ("b", 2L, 4L)))
    assert(viaAgg(df, 3) === viaWindow(df, 3))
  }

  test("topk is partition-invariant (merge path == single partition)") {
    val rows = (1L to 500L).map(i => ("g" + (i % 7), i % 23, i))
    val df = pairs(rows)
    assert(viaAgg(df.coalesce(1), 4) === viaAgg(df.repartition(11), 4))
    assert(viaAgg(df.repartition(11), 4) === viaWindow(df, 4))
  }

  test("groups smaller than k emit all their pairs, ranked") {
    val df = pairs(Seq(("a", 9L, 1L), ("a", 3L, 2L)))
    assert(viaAgg(df, 5) ===
      Set(("a", 1L, 1L, 9L), ("a", 2L, 2L, 3L)))
  }
}
