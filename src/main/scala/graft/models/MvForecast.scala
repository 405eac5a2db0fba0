package graft.models

import graft.core.SeriesFrame._
import org.apache.spark.ml.Transformer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multivariate forecasting — the reference's `SKLearnMV`
  * (/root/reference/src/scalecast/models.py:164-420): every target series is
  * modeled on the lags of ALL series (a VAR-by-OLS when the estimator is
  * linear), with one model per target and a shared recursive prediction loop
  * where each step's predictions for every series feed the next step's lag
  * matrix (models.py:368-407).
  *
  * Features follow the naming convention `xlag_<sid>_<k>` = lag k of series
  * `sid`, built wide (one pivot on the shared calendar — requires
  * [[graft.core.SeriesFrame.lineUpDates]] first) and joined back long.
  */
object MvForecast {

  def xlagCol(sid: String, k: Int): String = s"xlag_${sid}_$k"

  /** Add lags 1..maxLag of every series as feature columns on every row.
    *
    * Lag semantics are over the UNION calendar (a date any series has): each
    * series is densified onto the shared date spine (missing dates → null y)
    * and lagged inside its OWN window partition — so every window is
    * partitioned by series_id and the plan scales with #series, unlike a
    * wide pivot + global-ordered window. The per-series lag columns
    * (calendar-sized, driver-bounded) broadcast-join back onto every row. */
  def addCrossSeriesLags(df: DataFrame, seriesIds: Seq[String], maxLag: Int): DataFrame = {
    val spine = df.select(col(Ds)).distinct()
    val dense = spine
      .withColumn(SeriesId, explode(lit(seriesIds.toArray)))
      .join(df.select(col(SeriesId), col(Ds), col(Y)), Seq(SeriesId, Ds), "left")
    val lagged = dense.select(
      (Seq(col(SeriesId), col(Ds)) ++
        (1 to maxLag).map(k => lag(col(Y), k).over(w).as(s"_xl$k"))): _*)
    seriesIds.foldLeft(df) { (f, sid) =>
      val cols = col(Ds) +: (1 to maxLag).map(k => col(s"_xl$k").as(xlagCol(sid, k)))
      f.join(broadcast(lagged.filter(col(SeriesId) === sid).select(cols: _*)),
        Seq(Ds), "left")
    }
  }

  /** Fit one estimator per target series on the cross-series lag features
    * (train = observed, non-test, feature-complete rows of that series). */
  def fitPerSeries(frame: DataFrame, seriesIds: Seq[String], maxLag: Int,
                   algo: String = "mlr"): Map[String, Transformer] = {
    val feats = for (sid <- seriesIds; k <- 1 to maxLag) yield xlagCol(sid, k)
    seriesIds.map { sid =>
      sid -> (MllibTsEstimator(algo, feats)
        .fit(frame.filter(col(SeriesId) === sid)): Transformer)
    }.toMap
  }

  /** Above this many coupled series the scorer path's single-task state
    * (nSeries × (maxLag + h) ledger entries) stops being obviously tiny and
    * the step-wise ledger path takes over. MV cross-lag models are inherently
    * small-N — every model's feature width already grows with nSeries
    * (models.py:213-337), so real uses sit far below this. */
  val CoupledSetMax = 64

  private def parseXlag(c: String): Option[(String, Int)] =
    if (!c.startsWith("xlag_")) None
    else {
      val rest = c.stripPrefix("xlag_")
      val cut = rest.lastIndexOf('_')
      if (cut <= 0) None
      else {
        val kStr = rest.substring(cut + 1)
        if (kStr.nonEmpty && kStr.forall(_.isDigit)) Some((rest.substring(0, cut), kStr.toInt))
        else None
      }
    }

  /** MV dynamic forecast: each step's predictions for every series feed the
    * next step's cross-lag matrix (models.py:368-407).
    *
    * When every per-target model is row-scorable ([[RowScorer.unwrap]]) and
    * the coupled set is small, the whole recursion runs as ONE executor task:
    * cross-series coupling makes the set the irreducible unit of sequential
    * work (exactly the reference's loop), and its state is bounded at
    * nSeries × (maxLag + h) ledger entries. Otherwise: h steps, each filling
    * every series' step-i cross-lags from the shared ledger (actuals ∪ all
    * predictions so far) and scoring set-based — h × |series| small jobs. */
  def dynamicForecast(frame: DataFrame, models: Map[String, Transformer],
                      seriesIds: Seq[String], maxLag: Int): DataFrame = {
    val scorers = seriesIds.flatMap(sid => RowScorer.unwrap(models(sid)).map(sid -> _)).toMap
    if (scorers.size == seriesIds.size && seriesIds.size <= CoupledSetMax)
      dynamicForecastScorer(frame, models, seriesIds, maxLag, scorers)
    else dynamicForecastLedger(frame, models, seriesIds, maxLag)
  }

  /** The shared coupled-set walk: one executor task advances all series'
    * horizons together, scoring each (series, step) row with `score` and
    * feeding every prediction back into the shared cross-series ledger.
    * Returns the (series_id, _t, yhat) horizon scores. */
  private def coupledScores(withT: DataFrame, seriesIds: Seq[String], maxLag: Int,
                            featColsOf: Map[String, Seq[String]],
                            score: (String, Array[Double]) => Double): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
    val obs = withT.filter(!col(IsFuture))
    val fut = withT.filter(col(IsFuture))
    val unionFeats: Seq[String] = seriesIds.flatMap(featColsOf).distinct
    // per-target feature plan: union-array position, or (source series, lag)
    val plans: Map[String, Array[Either[Int, (String, Int)]]] = seriesIds.map { sid =>
      sid -> featColsOf(sid).map { c =>
        parseXlag(c) match {
          case Some(sk) => Right(sk): Either[Int, (String, Int)]
          case None     => Left(unionFeats.indexOf(c)): Either[Int, (String, Int)]
        }
      }.toArray
    }.toMap
    val lastT = obs.groupBy(SeriesId).agg(max("_t").as("_maxT"))
    val seed = obs.join(lastT, Seq(SeriesId))
      .filter(col("_t") > col("_maxT") - maxLag)
      .select(col(SeriesId), col("_t"), lit(0).as("_step"), col(Y).as("_v"),
        lit(null).cast("array<double>").as("_feats"))
    val futIn = fut.withColumn("_step", row_number().over(w))
      .select(col(SeriesId), col("_t"), col("_step"),
        lit(null).cast("double").as("_v"),
        array(unionFeats.map(c => col(c).cast("double")): _*).as("_feats"))
    val sidOrder = seriesIds.zipWithIndex.toMap
    val outSchema = StructType(Seq(StructField(SeriesId, withT.schema(SeriesId).dataType),
      StructField("_t", IntegerType), StructField("yhat", DoubleType)))
    seed.unionByName(futIn)
      .groupByKey(_ => 0)(Encoders.scalaInt)
      .flatMapGroups { (_: Int, it: Iterator[Row]) =>
        val rows = it.toArray
        val ledger = scala.collection.mutable.HashMap.empty[(String, Int), Double]
        rows.foreach(r => if (r.getInt(2) == 0 && !r.isNullAt(3))
          ledger((r.getString(0), r.getInt(1))) = r.getDouble(3))
        rows.filter(_.getInt(2) > 0)
          .sortBy(r => (r.getInt(2), sidOrder.getOrElse(r.getString(0), Int.MaxValue)))
          .iterator.map { r =>
            val sid = r.getString(0)
            val t = r.getInt(1)
            val uf = r.getSeq[Any](4)
            val feats = plans(sid).map {
              case Left(i)         => val v = uf(i); if (v == null) Double.NaN else v.asInstanceOf[Double]
              case Right((src, k)) => ledger.getOrElse((src, t - k), Double.NaN)
            }
            val yhat = score(sid, feats)
            ledger((sid, t)) = yhat
            Row(sid, t, yhat)
          }
      }(Encoders.row(outSchema)).toDF()
  }

  /** Coupled-set scorer path: one task walks all series' horizons together. */
  private[graft] def dynamicForecastScorer(frame: DataFrame, models: Map[String, Transformer],
                                           seriesIds: Seq[String], maxLag: Int,
                                           scorers: Map[String, RowScorer]): DataFrame = {
    val withT = frame.withColumn("_t", row_number().over(w)).localCheckpoint(true)
    val obs = withT.filter(!col(IsFuture))
    val fitted = seriesIds.map(sid => models(sid).transform(obs.filter(col(SeriesId) === sid)))
      .reduce(_ unionByName _)
    val fut = withT.filter(col(IsFuture))
    val outCols = (frame.columns :+ "yhat").toSeq.map(col)
    val scores = coupledScores(withT, seriesIds, maxLag,
      seriesIds.map(sid => sid -> scorers(sid).featureCols).toMap,
      (sid, feats) => scorers(sid).score(feats))
    val futScored = fut.join(scores, Seq(SeriesId, "_t"), "left")
    fitted.select(outCols: _*).unionByName(futScored.select(outCols: _*))
  }

  /** One grouped moments aggregation fits EVERY per-target equation at once
    * — the equations share the cross-lag design matrix (only y differs per
    * target), so nSeries MLlib fits collapse into one job + nSeries tiny
    * driver solves. Same normal-equation math as the MLlib normal solver and
    * the per-equation Cholesky the oracle replays. */
  def fitPerSeriesOls(frame: DataFrame, seriesIds: Seq[String], maxLag: Int): Map[String, Ols.Fit] = {
    import breeze.linalg.{DenseMatrix, DenseVector}
    // loud boundary, not a silent mis-scale: the shared design has
    // k = nSeries·maxLag + 1 columns, so the per-series moments row is k²
    // doubles and the coupled recursion is one sequential task — both stop
    // being cheap past the coupled-set bound. Bigger sets need a feature
    // screen (per-equation lag-correlation pruning) before a full cross-lag
    // VAR is meaningful; see the reference's own guidance that MV models
    // are small-N (models.py:213-337).
    require(seriesIds.size <= CoupledSetMax,
      s"coupled cross-lag OLS supports at most $CoupledSetMax series " +
        s"(got ${seriesIds.size}): the design width nSeries*maxLag+1 makes " +
        "the moments row quadratic in the series count. Use " +
        "graft.models.BlockedVar (correlation-screened bounded per-equation " +
        "designs, fully distributed) for larger coupled sets.")
    val feats = for (sid <- seriesIds; k <- 1 to maxLag) yield xlagCol(sid, k)
    val hasTest = frame.columns.contains("is_test")
    val obs = frame.filter(!col(IsFuture) && col(Y).isNotNull)
    val train0 = if (hasTest) obs.filter(!col("is_test")) else obs
    val train = feats.foldLeft(train0)((f, c) => f.filter(col(c).isNotNull))
    val xs: Seq[org.apache.spark.sql.Column] = lit(1.0) +: feats.map(c => col(c).cast("double"))
    val k = xs.size
    val aggs = (for (i <- 0 until k; j <- 0 to i) yield sum(xs(i) * xs(j)).as(s"a_${i}_$j")) ++
      (0 until k).map(i => sum(xs(i) * col(Y).cast("double")).as(s"b_$i"))
    val rows = train.groupBy(SeriesId).agg(aggs.head, aggs.tail: _*).collect()
    rows.filter(r => seriesIds.contains(r.getString(0))).map { r =>
      val a = DenseMatrix.zeros[Double](k, k)
      val b = DenseVector.zeros[Double](k)
      var idx = 1
      for (i <- 0 until k; j <- 0 to i) { a(i, j) = r.getDouble(idx); a(j, i) = a(i, j); idx += 1 }
      for (i <- 0 until k) { b(i) = r.getDouble(idx); idx += 1 }
      val beta = a \ b
      r.getString(0) -> Ols.Fit(beta(0), (1 until k).map(beta(_)).toArray, feats)
    }.toMap
  }

  /** MV dynamic forecast over closed-form fits: the fitted pass is ONE
    * cased expression over the whole frame (no per-series transforms) and
    * the recursion is the coupled-set walk. */
  def dynamicForecastOls(frame: DataFrame, fits: Map[String, Ols.Fit],
                         seriesIds: Seq[String], maxLag: Int): DataFrame = {
    val withT = frame.withColumn("_t", row_number().over(w)).localCheckpoint(true)
    val outCols = (frame.columns :+ "yhat").toSeq.map(col)
    val fittedExpr = seriesIds.foldLeft(lit(null).cast("double")) { (acc, sid) =>
      when(col(SeriesId) === sid, fits(sid).predictExpr).otherwise(acc)
    }
    val fitted = withT.filter(!col(IsFuture)).withColumn("yhat", fittedExpr)
    val fut = withT.filter(col(IsFuture))
    val scores = coupledScores(withT, seriesIds, maxLag,
      seriesIds.map(sid => sid -> fits(sid).feats).toMap,
      (sid, feats) => {
        val f = fits(sid)
        var s = f.intercept
        var i = 0
        val n = math.min(feats.length, f.beta.length)
        while (i < n) { s += f.beta(i) * feats(i); i += 1 }
        s
      })
    val futScored = fut.join(scores, Seq(SeriesId, "_t"), "left")
    fitted.select(outCols: _*).unionByName(futScored.select(outCols: _*))
  }

  /** Step-wise ledger path — the generic fallback for any `Transformer`. */
  private[graft] def dynamicForecastLedger(frame: DataFrame, models: Map[String, Transformer],
                                           seriesIds: Seq[String], maxLag: Int): DataFrame = {
    val withT = frame.withColumn("_t", row_number().over(w)).localCheckpoint(true)
    val obs = withT.filter(!col(IsFuture))
    val fittedParts = seriesIds.map(sid => models(sid).transform(obs.filter(col(SeriesId) === sid)))
    val fitted = fittedParts.reduce(_ unionByName _)

    val fut = withT.filter(col(IsFuture))
      .withColumn("_step", row_number().over(w)).localCheckpoint(true)
    val maxStep = {
      val r = fut.agg(max("_step")).first()
      if (r.isNullAt(0)) 0 else r.getInt(0)
    }
    // bounded ledger: only the last (maxLag + h) values per series are joinable
    val lastT = obs.groupBy(SeriesId).agg(max("_t").as("_maxT"))
    var known = obs.join(lastT, Seq(SeriesId))
      .filter(col("_t") > col("_maxT") - (maxLag + maxStep))
      .select(col(SeriesId), col("_t"), col(Y).as("_v")).localCheckpoint(true)
    var preds = List.empty[DataFrame]
    for (i <- 1 to maxStep) {
      var rows = fut.filter(col("_step") === i)
      for (sid <- seriesIds; k <- 1 to maxLag) {
        val c = xlagCol(sid, k)
        val lagged = known.filter(col(SeriesId) === sid)
          .select((col("_t") + k).as("_t"), col("_v").as(c))
        rows = rows.drop(c).join(lagged, Seq("_t"), "left")
      }
      val scored = seriesIds.map(sid =>
          models(sid).transform(rows.filter(col(SeriesId) === sid)))
        .reduce(_ unionByName _).localCheckpoint(true)
      known = known.unionByName(
        scored.select(col(SeriesId), col("_t"), col("yhat").as("_v"))).localCheckpoint(true)
      preds ::= scored
    }
    val out = preds.foldLeft(fitted)((acc, p) =>
      acc.unionByName(p.select(fitted.columns.map(col).toSeq: _*)))
    out.drop("_t", "_step", "_fraw", "_f")
  }
}
