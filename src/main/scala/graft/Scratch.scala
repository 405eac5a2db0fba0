package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for performance work (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMER $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.core.SeriesFrame._
    import graft.models.MvForecast
    import graft.operators.Transforms
    // warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    val sids = Seq("AUTOMOBILE", "BUILDING")
    val seg = time("segmentMonthly count") {
      val x = segmentMonthly(spark, dir).filter(col(SeriesId).isin(sids: _*))
      x.count(); x
    }
    val z = time("scaleT") { val x = Transforms.scaleT(seg).transform(seg); x.count(); x }
    val withLags = time("xlags") {
      val x = MvForecast.addCrossSeriesLags(withMonthlyHorizon(z, 6), sids, 1)
      x.count(); x
    }
    val fits = time("fitPerSeriesOls") { MvForecast.fitPerSeriesOls(withLags, sids, 1) }
    val out = time("dynamicForecastOls+count") {
      MvForecast.dynamicForecastOls(withLags, fits, sids, 1)
        .filter(col(IsFuture)).count()
    }
    println("rows " + out)
    // run the whole query end to end as the bench sees it
    time("qMvDynamic full (2nd)") { SparkEntry.queries("mv_dynamic")(spark, dir).count() }
    time("ts_prophet_like full (2nd)") { SparkEntry.queries("ts_prophet_like")(spark, dir).count() }
    spark.stop()
  }
}
