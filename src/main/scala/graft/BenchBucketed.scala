package graft

import org.apache.spark.sql.SparkSession

/** A/B bench of the bucketed-lake memo layout (SURVEY §8 — the DEFAULT
  * memo mode since round 9; `graft.bucketedMemo=0` is the checkpoint
  * escape hatch): runs the FULL ts_* tier twice in one session —
  * checkpoint memos, then bucketed-table memos — and reports per-query
  * seconds, result equality, and the exchange counts of a representative
  * series-keyed window plan in both modes. Writes the JSON line to
  * `bench_bucketed.json` (stdout-truncation-proof, like graft.Bench).
  *
  * What the numbers mean at 100 TB: the fixture memos are a few hundred
  * rows, so wall-clock deltas here are scheduler noise — the exchange
  * COUNT is the scale signal (each deleted Exchange is a full fact-table
  * shuffle on a cluster, per query, forever).
  */
object BenchBucketed {

  /** The whole series tier: every declared ts_* query (the round-8 A/B ran
    * six window-heavy ones; the default flip wants the full-tier proof). */
  private val Queries = SparkEntry.queries.keys.filter(_.startsWith("ts_"))
    .toSeq.sorted

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def runAll(): (Map[String, Double], Map[String, Array[String]]) = {
      SparkEntry.clearMemos()
      val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val results = scala.collection.mutable.LinkedHashMap.empty[String, Array[String]]
      Queries.foreach { q =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(q)(spark, sfDir).collect().map(_.toString).sorted
        times(q) = (System.nanoTime() - t0) / 1e9
        results(q) = rows
      }
      (times.toMap, results.toMap)
    }

    /** Exchanges in the executed plan of the representative per-series
      * window (diff) built straight on the zorders memo frame. */
    def windowExchanges(): Int = {
      import org.apache.spark.sql.functions._
      val base = SparkEntry.queries("ts_diff")(spark, sfDir)
      base.collect()
      "Exchange hashpartitioning".r
        .findAllIn(base.queryExecution.executedPlan.toString).length
    }

    System.setProperty("graft.bucketedMemo", "0") // checkpoint arm
    val (baseT, baseR) = runAll()
    val baseEx = windowExchanges()
    System.clearProperty("graft.bucketedMemo") // bucketed arm = the default
    val (buckT, buckR) = runAll()
    val buckEx = windowExchanges()
    SparkEntry.clearMemos()

    val equal = Queries.forall(q => baseR(q).sameElements(buckR(q)))
    def f3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def m(t: Map[String, Double]): String =
      Queries.map(q => s""""$q":${f3(t(q))}""").mkString("{", ",", "}")
    val line = s"""{"metric":"bench_bucketed","unit":"sec","queries":${Queries
      .map(q => "\"" + q + "\"").mkString("[", ",", "]")},"checkpoint":${m(baseT)},"bucketed":${m(buckT)},"results_equal":$equal,"ts_diff_exchanges_checkpoint":$baseEx,"ts_diff_exchanges_bucketed":$buckEx,"sf":"$sfDir"}"""
    println(line)
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_bucketed.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
