package graft.models

import graft.core.SeriesFrame._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Per-series exact OLS at ANY series count — the grouped twin of [[Ols]]:
  * the k(k+1)/2 + k normal-equation moments come from ONE aggregation
  * grouped by series_id, and the (k+1)×(k+1) solves map over the per-series
  * stats rows on the executors (the [[graft.functions.Diagnostics.adfT]]
  * pattern) — no observation, moment, or fit ever reaches the driver. This
  * is what per-series search decisions (the §2.8 meta-ops applied to 10⁶
  * series in one frame) fit with.
  *
  * Train slice matches [[Ols.fit]]: observed, non-test, y and all features
  * non-null. A series whose normal equations are singular solves to
  * non-finite βs; downstream scorers surface that as NaN and per-series
  * deciders skip it (the reference's failed-combo policy, per series).
  */
object GroupedOls {

  /** One β row per series: (series_id, beta array[k+1]), intercept at
    * index 0 — [[Ols.Fit]]'s layout. */
  def fitBySeries(frame: DataFrame, feats: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType, StructField, StructType}
    val hasTest = frame.columns.contains("is_test")
    val obs = frame.filter(!col(IsFuture) && col(Y).isNotNull)
    val train0 = if (hasTest) obs.filter(!col("is_test")) else obs
    val train = feats.foldLeft(train0)((f, c) => f.filter(col(c).isNotNull))
    val xs: Seq[Column] = lit(1.0) +: feats.map(c => col(c).cast("double"))
    val k = xs.size
    val aggs = (for (i <- 0 until k; j <- 0 to i) yield
      sum(xs(i) * xs(j)).as(s"sa_${i}_$j")) ++
      (0 until k).map(i => sum(xs(i) * col(Y).cast("double")).as(s"sb_$i"))
    val outSchema = StructType(Seq(StructField(SeriesId, StringType),
      StructField("beta", ArrayType(DoubleType, containsNull = false))))
    train.groupBy(SeriesId).agg(aggs.head, aggs.tail: _*)
      .map({ r =>
        val a = Array.tabulate(k, k)((i, j) =>
          r.getDouble(r.fieldIndex(s"sa_${math.max(i, j)}_${math.min(i, j)}")))
        val b = Array.tabulate(k)(i => r.getDouble(r.fieldIndex(s"sb_$i")))
        Row(r.getString(r.fieldIndex(SeriesId)), solve(a, b).toSeq)
      })(Encoders.row(outSchema)).toDF()
  }

  /** The prediction expression over a frame that has the per-series `beta`
    * array joined in: β₀ + Σ βᵢ·featᵢ (null features → null yhat). */
  def predictExpr(feats: Seq[String]): Column =
    feats.zipWithIndex.foldLeft(element_at(col("beta"), 1)) {
      case (acc, (c, i)) => acc + col(c).cast("double") * element_at(col("beta"), i + 2)
    }

  /** Per-series fit + vectorized score in the common by-series output shape
    * (series_id, ds, yhat) — [[graft.models.Svr.fitPredictBySeries]]'s
    * contract for the closed-form family. Conformal bounds attach via
    * [[graft.operators.Conformal.attachBySeries]] (the reference's CI
    * contract at any series count). */
  def fitPredictBySeries(frame: DataFrame, feats: Seq[String]): DataFrame =
    frame.join(fitBySeries(frame, feats), Seq(SeriesId), "left")
      .withColumn("yhat", predictExpr(feats))
      .select(col(SeriesId), col(Ds), col("yhat"))

  /** Per-series validation RMSE of the per-series OLS — the grouped
    * [[graft.eval.AutoSelect.scoreFeatures]]: last-h holdout per series,
    * vectorized prediction, one metrics row per series. A series whose fit
    * is singular or whose holdout is empty simply has no row / a NaN —
    * per-series deciders treat that as "skip". */
  def scoreFeaturesBySeries(frame: DataFrame, feats: Seq[String], h: Int): DataFrame = {
    val flagged = withTestFlag(frame, h)
    val fits = fitBySeries(flagged, feats)
    val scored = flagged.join(fits, Seq(SeriesId), "left")
      .withColumn("yhat", predictExpr(feats))
    graft.eval.Evaluation.metricsOverTest(scored, Seq("rmse"))
  }

  /** [[solve]] for callers outside the models package — the SQL aggregate
    * [[graft.functions.OlsFit]] shares the exact executor-side kernel. */
  def sqlSolve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = solve(a, b)

  /** Score MANY candidate feature subsets per series in TWO full-frame
    * passes — the batched [[scoreFeaturesBySeries]] for searches whose
    * candidates all draw from one shared feature pool (auto_Xvar_select's
    * 12 reachable sets). One fit pass + one metrics pass PER CANDIDATE
    * (what the naive loop pays) becomes one grouped-moments pass + one
    * grouped-RMSE pass TOTAL: at 10⁶ series the search cost stops scaling
    * with the candidate count.
    *
    * Contract: every candidate's features ⊆ `alwaysPool ++ lagPool`, where
    * `alwaysPool` columns are non-null on observed rows and `lagPool`
    * columns have NESTED null sets — null(lagPool(0)) ⊆ null(lagPool(1)) ⊆
    * … (the AR-lag series-head shape) — and a candidate uses a PREFIX of
    * `lagPool`. Pass 1 groups the FULL pool's normal-equation moments by
    * (series, depth) where depth = number of leading non-null lag columns;
    * a candidate using the first a lag columns sums the depth ≥ a strata,
    * which is exactly its non-null-feature train slice ([[fitBySeries]]'s
    * filter). Lag nulls are zero-filled inside the aggregation — a stratum
    * where lag_k is null never reaches a candidate that reads lag_k's
    * moments, so the fill is unobservable. The per-candidate sub-matrix
    * solves run in `mapGroups` over the ≤(lagPool.size+1) tiny stats rows
    * per series — [[solve]] on the candidate's own feature order, like the
    * per-candidate fit would. Pass 2 broadcasts the per-series beta rows
    * back and computes every candidate's holdout RMSE in one conditional
    * aggregation, reproducing [[graft.eval.Evaluation.metricsOverTest]]'s
    * filter (is_test ∧ yhat non-null ∧ non-NaN) and
    * sqrt(avg((yhat−y)²)) per candidate.
    *
    * Returns one row per series: (series_id, r_<key> DOUBLE per candidate,
    * null where the candidate has no scorable holdout rows — the same null
    * a full outer join of per-candidate score frames would carry). */
  def scoreFeatureSetsBySeries(frame: DataFrame, alwaysPool: Seq[String],
                               lagPool: Seq[String],
                               candidates: Seq[(String, Seq[String])],
                               h: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType, StructField, StructType}
    val pool = alwaysPool ++ lagPool
    candidates.foreach { case (key, feats) =>
      val lagUsed = feats.filter(lagPool.contains)
      require(feats.forall(pool.contains) && lagUsed == lagPool.take(lagUsed.size),
        s"candidate $key must draw from the pool and use a lagPool prefix")
    }
    val flagged = withTestFlag(frame, h)
    val train = flagged.filter(!col(IsFuture) && col(Y).isNotNull && !col("is_test"))
    // depth = leading non-null lag count; nested nulls make this the row's
    // full null signature over the pool
    val depth = lagPool.zipWithIndex.foldRight(lit(lagPool.size)) {
      case ((c, i), rest) => when(col(c).isNull, lit(i)).otherwise(rest)
    }
    val xs: Seq[Column] = lit(1.0) +:
      (alwaysPool.map(c => col(c).cast("double")) ++
        lagPool.map(c => coalesce(col(c).cast("double"), lit(0.0))))
    val k = xs.size
    val aggs = (for (i <- 0 until k; j <- 0 to i) yield
      sum(xs(i) * xs(j)).as(s"sa_${i}_$j")) ++
      (0 until k).map(i => sum(xs(i) * col(Y).cast("double")).as(s"sb_$i"))
    val stats = train.withColumn("_depth", depth)
      .groupBy(col(SeriesId), col("_depth")).agg(aggs.head, aggs.tail: _*)
    // candidate feature → pool index (+1 for the intercept at 0), in the
    // candidate's own order so the pivoting path matches a direct fit
    val candIdx: Seq[(String, Array[Int], Int)] = candidates.map { case (key, feats) =>
      val lagCount = feats.count(lagPool.contains)
      (key, (0 +: feats.map(f => pool.indexOf(f) + 1)).toArray, lagCount)
    }
    val betaSchema = StructType(StructField(SeriesId, StringType) +:
      candidates.map { case (key, _) =>
        StructField(s"_beta_$key", ArrayType(DoubleType, containsNull = false)) })
    val nMom = k * (k + 1) / 2
    val betas = stats
      .groupByKey(r => r.getString(r.fieldIndex(SeriesId)))(Encoders.STRING)
      .mapGroups { (sid, it) =>
        // depth → (a-moments, b-moments); ≤ lagPool.size+1 rows per series
        val byDepth = it.map { r =>
          val a = Array.tabulate(nMom)(m => r.getDouble(2 + m))
          val b = Array.tabulate(k)(i => r.getDouble(2 + nMom + i))
          (r.getInt(r.fieldIndex("_depth")), (a, b))
        }.toMap
        val cells = candIdx.map { case (_, idx, lagCount) =>
          val strata = byDepth.filter(_._1 >= lagCount).values
          if (strata.isEmpty) Array(Double.NaN)
          else {
            val kk = idx.length
            val a = Array.ofDim[Double](kk, kk)
            val b = new Array[Double](kk)
            for (((sa, sb), _) <- strata.zipWithIndex; i <- 0 until kk; j <- 0 until kk) {
              val (hi, lo) = (math.max(idx(i), idx(j)), math.min(idx(i), idx(j)))
              a(i)(j) += sa(hi * (hi + 1) / 2 + lo)
              if (j == 0) b(i) += sb(idx(i))
            }
            solve(a, b)
          }
        }
        Row.fromSeq(sid +: cells.map(_.toSeq))
      }(Encoders.row(betaSchema)).toDF()
    // pass 2 touches ONLY the holdout slice (h of the obs rows per series)
    // and only the pool columns — joining betas onto the full feature
    // frame instead cost an 8× bigger shuffle join + aggregation input
    // and 24 GB of aggregation spill at 10⁶ series
    val testRows = flagged.filter(col("is_test") && col(Y).isNotNull)
      .select((col(SeriesId) +: col(Y).cast("double").as(Y) +:
        pool.map(c => col(c).cast("double"))): _*)
    val scoredBase = testRows.join(graft.core.Joins.maybeBroadcast(betas),
      Seq(SeriesId), "left")
    val rmseAggs = candidates.flatMap { case (key, feats) =>
      val yhat = feats.zipWithIndex.foldLeft(element_at(col(s"_beta_$key"), 1)) {
        case (acc, (c, i)) => acc + col(c) * element_at(col(s"_beta_$key"), i + 2)
      }
      val ok = yhat.isNotNull && !isnan(yhat)
      Seq(sum(when(ok, pow(yhat - col(Y), 2))).as(s"_ss_$key"),
        count(when(ok, lit(1))).as(s"_n_$key"))
    }
    scoredBase.groupBy(SeriesId).agg(rmseAggs.head, rmseAggs.tail: _*)
      .select(col(SeriesId) +: candidates.map { case (key, _) =>
        sqrt(col(s"_ss_$key") / col(s"_n_$key")).as(s"r_$key") }: _*)
  }

  /** Gaussian elimination with partial pivoting — the executor-side solver
    * shared by every grouped closed-form fit (here and [[BlockedVar]]). */
  private[models] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val k = b0.length
    val a = a0.map(_.clone); val b = b0.clone
    for (c <- 0 until k) {
      val piv = (c until k).maxBy(r => math.abs(a(r)(c)))
      val t = a(c); a(c) = a(piv); a(piv) = t
      val tb = b(c); b(c) = b(piv); b(piv) = tb
      val d = a(c)(c)
      for (j <- 0 until k) a(c)(j) /= d
      b(c) /= d
      for (r <- 0 until k if r != c) {
        val f = a(r)(c)
        for (j <- 0 until k) a(r)(j) -= f * a(c)(j)
        b(r) -= f * b(c)
      }
    }
    b
  }
}
