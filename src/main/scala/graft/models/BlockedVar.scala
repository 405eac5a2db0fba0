package graft.models

import graft.core.SeriesFrame._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked cross-lag VAR — the scale path PAST
  * [[MvForecast.CoupledSetMax]]: the full SKLearnMV design (every target on
  * the lags of ALL series, models.py:213-337) has width nSeries·maxLag + 1,
  * so its normal-equation moments grow QUADRATICALLY with the series count;
  * beyond ~64 coupled series the honest answer is a bounded per-equation
  * design. This operator delivers it fully distributed:
  *
  *  1. **Screen** (one equi-join keyed by date): every (target, source)
  *     pair's lag-1 correlation from the long-format lag table — the
  *     explicit nSeries² pair pass, shuffle-keyed by (target, source), the
  *     one place quadratic cost is inherent and therefore paid ONCE, on
  *     slim rows.
  *  2. **Block**: each target keeps its own lags plus the
  *     `maxSources − 1` strongest foreign sources (|corr| rank, ties by
  *     source id) — every equation's width is now the CONSTANT
  *     k = maxSources·maxLag + 1.
  *  3. **Fit**: the normal-equation moments of EVERY equation come from one
  *     long-format self-join keyed by (target, ds) + one grouped
  *     aggregation pivoted over the k² bounded feature-index pairs; the
  *     k×k solves map over the per-target stats rows ON THE EXECUTORS
  *     (same pattern as [[graft.functions.Diagnostics.adfT]]) — no
  *     observation row, moment row, or fit ever reaches the driver.
  *  4. **Score**: fitted values are a join + grouped dot product.
  *
  * Every stage is a bounded-width shuffle, so the operator holds at 10⁴⁺
  * series where the coupled-set design cannot.
  */
object BlockedVar {

  /** Long-format lag table: (src, ds, lag, xval), lags 1..maxLag inside each
    * series' own window partition. */
  private def lagsLong(obs: DataFrame, maxLag: Int): DataFrame =
    obs.select(col(SeriesId).as("src"), col(Ds),
        array((1 to maxLag).map(k => lag(col(Y), k).over(w)): _*).as("_ls"))
      .select(col("src"), col(Ds), posexplode(col("_ls")).as(Seq("_p", "xval")))
      .withColumn("lag", col("_p") + 1).drop("_p")
      .filter(col("xval").isNotNull)

  /** Step 1+2: the per-target source block — (target, src, src_rank) with
    * rank 0 = the target itself, ranks 1..maxSources−1 the strongest
    * foreign sources by |lag-1 correlation| (ties broken by src id). */
  def screen(frame: DataFrame, maxLag: Int, maxSources: Int): DataFrame = {
    val obs = frame.filter(!col(IsFuture) && col(Y).isNotNull)
    val targets = obs.select(col(SeriesId).as("target"), col(Ds), col(Y))
    val pairs = targets.join(lagsLong(obs, 1), Seq(Ds.toString))
      .filter(col("target") =!= col("src"))
      .groupBy("target", "src").agg(corr(col(Y), col("xval")).as("_c"))
      .filter(col("_c").isNotNull)
    val ranked = pairs.withColumn("src_rank",
      row_number().over(Window.partitionBy("target")
        .orderBy(abs(col("_c")).desc, col("src").asc)))
      .filter(col("src_rank") <= maxSources - 1)
      .select(col("target"), col("src"), col("src_rank"))
    obs.select(col(SeriesId).as("target")).distinct()
      .withColumn("src", col("target")).withColumn("src_rank", lit(0))
      .unionByName(ranked)
  }

  /** Fitted blocked-VAR equations: one row per target with the fitted β in
    * feature-index order (featIdx = src_rank·maxLag + lag − 1, intercept
    * last) — plus the chosen block for interpretation/replay.
    * Returns (fits, block) where fits = (target, beta array[k]) and
    * block = [[screen]]'s (target, src, src_rank). */
  def fit(frame: DataFrame, maxLag: Int, maxSources: Int): (DataFrame, DataFrame) = {
    val obs = frame.filter(!col(IsFuture) && col(Y).isNotNull)
    val block = screen(frame, maxLag, maxSources).localCheckpoint(false)
    val k = maxSources * maxLag + 1
    val design = designRows(obs, block, maxLag, k)
    // complete (target, ds) rows: all k features present and y known
    val complete = design.groupBy("target", Ds)
      .agg(count(lit(1)).as("_nf")).filter(col("_nf") === k)
      .select("target", Ds)
    val rows = design.join(complete, Seq("target", Ds.toString))
      .join(obs.select(col(SeriesId).as("target"), col(Ds), col(Y).as("_yt")),
        Seq("target", Ds.toString))
    // ONE self-join keyed by (target, ds) expands the k² moment products;
    // ONE grouped aggregation pivots them into sa_i_j / sb_i columns
    val prods = rows.as("a").join(
        rows.select(col("target"), col(Ds), col("fi").as("fj"), col("x").as("xj")).as("b"),
        Seq("target", Ds.toString))
      .filter(col("fi") >= col("fj"))
    val aggs =
      (for (i <- 0 until k; j <- 0 to i) yield
        sum(when(col("fi") === i && col("fj") === j, col("x") * col("xj"))).as(s"sa_${i}_$j")) ++
      (0 until k).map(i =>
        sum(when(col("fi") === i && col("fj") === i, col("x") * col("_yt"))).as(s"sb_$i"))
    val stats = prods.groupBy("target").agg(aggs.head, aggs.tail: _*)
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType, StructField, StructType}
    val outSchema = StructType(Seq(StructField("target", StringType),
      StructField("beta", ArrayType(DoubleType, containsNull = false))))
    val fits = stats.map({ r =>
      val a = Array.tabulate(k, k)((i, j) =>
        r.getDouble(r.fieldIndex(s"sa_${math.max(i, j)}_${math.min(i, j)}")))
      val b = Array.tabulate(k)(i => r.getDouble(r.fieldIndex(s"sb_$i")))
      Row(r.getString(r.fieldIndex("target")), GroupedOls.solve(a, b).toSeq)
    })(Encoders.row(outSchema)).toDF()
    (fits, block)
  }

  /** Fitted values over the complete observed rows: (series_id, ds, y, yhat)
    * — a join + grouped dot product, no per-equation jobs. */
  def fittedValues(frame: DataFrame, maxLag: Int, maxSources: Int): DataFrame = {
    val obs = frame.filter(!col(IsFuture) && col(Y).isNotNull)
    val (fits, block) = fit(frame, maxLag, maxSources)
    val k = maxSources * maxLag + 1
    val design = designRows(obs, block, maxLag, k)
    val complete = design.groupBy("target", Ds)
      .agg(count(lit(1)).as("_nf")).filter(col("_nf") === k)
      .select("target", Ds)
    design.join(complete, Seq("target", Ds.toString))
      .join(fits, Seq("target"))
      .groupBy(col("target"), col(Ds))
      .agg(sum(col("x") * element_at(col("beta"), col("fi") + 1)).as("yhat"))
      .join(obs.select(col(SeriesId).as("target"), col(Ds), col(Y)),
        Seq("target", Ds.toString))
      .select(col("target").as(SeriesId), col(Ds), col(Y), col("yhat"))
  }

  /** Recursive horizon forecast over the blocked equations — the coupled
    * walk of [[MvForecast.dynamicForecast]] at blocked scale: each horizon
    * step fills EVERY target's screened-source lags from the shared ledger
    * (actuals ∪ all predictions so far) and scores them set-based — one
    * small job per step, independent of the series count. Requires
    * date-aligned series (each series' horizon spine at the same dates),
    * the same contract as the coupled-set path. Returns horizon rows
    * (series_id, ds, yhat). */
  def dynamicForecast(frame: DataFrame, maxLag: Int, maxSources: Int): DataFrame = {
    val (fits0, block0) = fit(frame, maxLag, maxSources)
    val fits = fits0.localCheckpoint(false)
    val block = block0
    val k = maxSources * maxLag + 1
    val withT = frame.withColumn("_t", row_number().over(w)).localCheckpoint(true)
    val obs = withT.filter(!col(IsFuture))
    val fut = withT.filter(col(IsFuture))
      .withColumn("_step", row_number().over(w)).localCheckpoint(true)
    val maxStep = {
      val r = fut.agg(max("_step")).first()
      if (r.isNullAt(0)) 0 else r.getInt(0)
    }
    // ledger seed: only the trailing maxLag + h actuals per series matter
    val lastT = obs.groupBy(SeriesId).agg(max("_t").as("_maxT"))
    var known = List(obs.join(lastT, Seq(SeriesId))
      .filter(col("_t") > col("_maxT") - (maxLag + maxStep))
      .select(col(SeriesId).as("src"), col("_t"), col(Y).as("_v"))
      .localCheckpoint(true))
    var preds = List.empty[DataFrame]
    val lagIdx = (1 to maxLag).toArray
    for (i <- 1 to maxStep) {
      val ledger = known.reduce(_ unionByName _)
      val rows = fut.filter(col("_step") === i)
        .select(col(SeriesId).as("target"), col(Ds), col("_t"))
      val feats = rows.join(block, Seq("target"))
        .withColumn("lag", explode(lit(lagIdx)))
        .join(ledger.withColumnRenamed("_t", "_tv"),
          Seq("src")) // then align _tv = _t - lag
        .filter(col("_tv") === col("_t") - col("lag"))
        .select(col("target"), col(Ds), col("_t"),
          (col("src_rank") * maxLag + col("lag") - 1).as("fi"), col("_v").as("x"))
        .unionByName(rows.select(col("target"), col(Ds), col("_t"),
          lit(k - 1).as("fi"), lit(1.0).as("x")))
      val scored = feats.join(fits, Seq("target"))
        .groupBy(col("target"), col(Ds), col("_t"))
        .agg(sum(col("x") * element_at(col("beta"), col("fi") + 1)).as("yhat"))
        .localCheckpoint(true)
      known ::= scored.select(col("target").as("src"), col("_t"), col("yhat").as("_v"))
      preds ::= scored
    }
    preds.reduceOption(_ unionByName _)
      .map(_.select(col("target").as(SeriesId), col(Ds), col("yhat")))
      .getOrElse(frame.sparkSession.emptyDataFrame)
  }

  /** Long design rows (target, ds, fi, x): the block's source lags at
    * featIdx = src_rank·maxLag + lag − 1, plus the intercept at k − 1. */
  private def designRows(obs: DataFrame, block: DataFrame, maxLag: Int,
                         k: Int): DataFrame = {
    val feats = block.join(lagsLong(obs, maxLag), Seq("src"))
      .select(col("target"), col(Ds),
        (col("src_rank") * maxLag + col("lag") - 1).as("fi"), col("xval").as("x"))
    val icpt = obs.select(col(SeriesId).as("target"), col(Ds),
      lit(k - 1).as("fi"), lit(1.0).as("x"))
    feats.unionByName(icpt)
  }

}
