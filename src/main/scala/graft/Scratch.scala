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
    // warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    if (args.headOption.contains("stages")) {
      import graft.functions.TextOps
      import graft.operators.Similarity
      val docs = graft.core.Tables.documents(spark, dir)
      val vecs = time("trigramVectors") {
        val v = TextOps.trigramVectors(docs, "doc_id", "text"); v.count(); v
      }
      val vecsC = vecs.localCheckpoint(true)
      time("nearDup given vecs") {
        Similarity.cosineNearDupPairs(vecsC, "vid", "vec", 0.98,
          bands = 16, bitsPerBand = 10).count()
      }
      time("nearDup given vecs (2nd)") {
        Similarity.cosineNearDupPairs(vecsC, "vid", "vec", 0.98,
          bands = 16, bitsPerBand = 10).count()
      }
    } else if (args.headOption.contains("cross")) {
      import graft.functions.TextOps
      import graft.operators.Similarity
      val docs = graft.core.Tables.documents(spark, dir)
      val corpus = TextOps.trigramVectors(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), "doc_id", "text")
      val probes = TextOps.trigramVectors(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0), "doc_id", "text")
      time("corpus trigram count") { corpus.count() }
      time("probe trigram count") { probes.count() }
      val pp = time("pp checkpoint count") {
        val p = Similarity.prepared(probes, "vid", "vec").localCheckpoint(false)
        p.count(); p
      }
      time("pp dims+collect") {
        pp.select(size(col("v"))).first()
        pp.select(col("vid"), col("v"), col("nrm")).collect()
      }
      time("corpus prepared scan") {
        Similarity.prepared(corpus, "vid", "vec").count()
      }
      time("full cross op") {
        Similarity.crossCosineMatches(corpus, probes, "vid", "vec", 0.98, 16, 10).count()
      }
    } else if (args.headOption.contains("pipe")) {
      import graft.operators.Dedup
      import graft.functions.TextOps
      val docs = graft.core.Tables.documents(spark, dir)
      time("docs count") { docs.count() }
      val shAll = Dedup.shingles(docs, "doc_id", "text", 3)
      time("shingles") { shAll.count() }
      time("shingles again") { shAll.count() }
      time("jaccard end-to-end") {
        Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8, 100).count()
      }
      time("stats") { TextOps.withTextStats(docs).count() }
    } else if (args.headOption.contains("fp")) {
      import graft.operators.Dedup
      import graft.functions.TextOps
      val docs = graft.core.Tables.documents(spark, dir)
      val fp = TextOps.winnowFingerprints(docs, "doc_id", "text", 8, 4)
      time("winnow (distinct doc,p,h)") { println("  fp rows=" + fp.count()) }
      time("winnow again") { fp.count() }
      time("pairs full op") {
        println("  pair rows=" +
          Dedup.fingerprintPairs(docs, "doc_id", "text", 8, 4, 50, 100).count())
      }
    } else if (args.headOption.contains("cc")) {
      import spark.implicits._
      val edges = (0L until 40L).flatMap(i =>
        Seq((s"t${2 * i}", s"t${2 * i + 1}"))).toDF("a", "b")
      time("cc cold") {
        graft.operators.Graph.connectedComponents(edges, "a", "b").count()
      }
      time("cc warm") {
        graft.operators.Graph.connectedComponents(edges, "a", "b").count()
      }
    } else if (args.headOption.contains("blocked")) {
      import graft.core.SeriesFrame
      val seg = time("segments memo") {
        val base = SeriesFrame.segmentMonthly(spark, dir)
        val z = graft.operators.Transforms.scaleT(base).transform(base)
        val lined = SeriesFrame.lineUpDates(z).localCheckpoint(true)
        lined.count(); lined
      }
      val (fits, block) = time("fit (screen + solve)") {
        val r = graft.models.BlockedVar.fit(seg, maxLag = 1, maxSources = 3)
        (r._1.localCheckpoint(true), r._2.localCheckpoint(true))
      }
      time("dynamic recursion") {
        val base = SeriesFrame.withMonthlyHorizon(seg, 6)
        graft.models.BlockedVar.dynamicForecastWith(base, fits, block,
          maxLag = 1, maxSources = 3).count()
      }
      time("dynamic recursion warm") {
        val base = SeriesFrame.withMonthlyHorizon(seg, 6)
        graft.models.BlockedVar.dynamicForecastWith(base, fits, block,
          maxLag = 1, maxSources = 3).count()
      }
    } else if (args.headOption.contains("spans")) {
      import graft.operators.Dedup
      import org.apache.spark.sql.expressions.Window
      val docs = graft.core.Tables.documents(spark, dir)
      val st = Dedup.spanStarts(docs, "doc_id", "text", 8)
      time("spanStarts")(println("  rows=" + st.count()))
      val dupH = st.groupBy("h").agg(count(lit(1)).as("_cnt"))
        .filter(col("_cnt") >= 2).select("h")
      val dup = st.join(graft.core.Joins.maybeBroadcast(dupH), Seq("h"), "left_semi")
      time("  + dup-h semi join")(println("  rows=" + dup.count()))
      val isl = dup.withColumn("_grp",
        col("pos") - row_number().over(Window.partitionBy("doc").orderBy("pos")))
      time("  + doc islands")(println("  rows=" + isl.count()))
      def mat(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      time("full dupSpans")(mat(Dedup.dupSpans(docs, "doc_id", "text", 8)))
      time("full dupSpans (2nd)")(mat(Dedup.dupSpans(docs, "doc_id", "text", 8)))
      time("full stripDupSpans")(mat(Dedup.stripDupSpans(docs, "doc_id", "text", 8)))
      time("full stripDupSpans (2nd)")(mat(Dedup.stripDupSpans(docs, "doc_id", "text", 8)))
    } else if (args.headOption.contains("fpplan")) {
      import graft.operators.Dedup
      val docs = graft.core.Tables.documents(spark, dir)
      val q = Dedup.fingerprintPairs(docs, "doc_id", "text", 8, 4, 50, 100)
      val ep = q.queryExecution.executedPlan
      ep.execute().count() // finalize the adaptive plan before printing
      println(ep.toString)
    } else if (args.headOption.contains("xvarscale")) {
      // per-NODE spill attribution for the 10⁶-series auto-xvar search:
      // which exact operator inside the one compute stage spills
      val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(32L, n * 96 / 500000L).toString)
      val frame = BenchScale.syntheticFrame(spark, n, 96).localCheckpoint(true)
      val q = graft.eval.AutoSelect.autoXvarSelectBySeries(frame)
      val ep = q.queryExecution.executedPlan
      time("auto_xvar") { ep.execute().count() }
      def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
        val ms = p.metrics.filter { case (k, m) => m.value > 0 &&
          (k.contains("spill") || k.contains("Time") || k.contains("sort") ||
            k.contains("peak") || k == "numOutputRows") }
          .map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
        println(("  " * d) + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan, d + 1)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(s.plan, d + 1)
          case _ => p.children.foreach(walk(_, d + 1))
        }
      }
      walk(ep, 0)
    } else {
      val names = if (args.nonEmpty) args.toSeq else Seq("doc_neardup_cosine")
      names.foreach { n =>
        time(s"$n (cold)") { println(s"  rows=" + SparkEntry.queries(n)(spark, dir).count()) }
        time(s"$n (warm)") { SparkEntry.queries(n)(spark, dir).count() }
      }
    }
    spark.stop()
  }
}
