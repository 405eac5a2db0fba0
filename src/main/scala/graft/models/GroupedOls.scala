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

  /** Score MANY candidate feature subsets per series in ONE full-frame
    * pass — the batched [[scoreFeaturesBySeries]] for searches whose
    * candidates all draw from one shared feature pool (auto_Xvar_select's
    * 12 reachable sets). One fit pass + one metrics pass PER CANDIDATE
    * (what the naive loop pays) becomes a single fixed-width grouped
    * aggregation TOTAL: at 10⁶ series the search cost scales with neither
    * the candidate count nor anything super-linear in the series count.
    *
    * Contract: every candidate's features ⊆ `alwaysPool ++ lagPool`, where
    * `alwaysPool` columns are non-null on observed rows and `lagPool`
    * columns have NESTED null sets — null(lagPool(0)) ⊆ null(lagPool(1)) ⊆
    * … (the AR-lag series-head shape) — and a candidate uses a PREFIX of
    * `lagPool`.
    *
    * Shape: one `groupBy(series_id)` aggregation accumulates, per distinct
    * candidate lag depth ℓ, the normal-equation moments of the first
    * (1+|always|+ℓ) pool columns over train rows with ≥ ℓ leading non-null
    * lags (exactly the candidate's non-null-feature train slice,
    * [[fitBySeries]]'s filter; lag nulls are zero-filled inside the
    * aggregation — a row with depth < ℓ never reaches a candidate that
    * reads lag ℓ, so the fill is unobservable) — AND the h holdout rows
    * pivoted into step-indexed sum columns (step s = position from the
    * series end, the [[withTestFlag]] count; one row matches each (series,
    * step), so `sum(when(step=s, v))` IS that row's value). Everything is
    * a fixed-width `sum(when(...))` — whole-stage-codegen HashAggregate,
    * no collect_list object buffers, no second pass, no beta join, no
    * mapGroups re-sort. The per-candidate sub-matrix [[solve]]s and the
    * holdout RMSE (reproducing [[graft.eval.Evaluation.metricsOverTest]]'s
    * filter: is_test ∧ yhat non-null ∧ non-NaN, summed in ds order) run in
    * a plain `.map` over the one aggregated row per series. When the
    * caller's frame already carries a per-series window lineage (the
    * auto_Xvar feature build), the whole score is ONE shuffle: the window
    * exchange's hash(series) partitioning satisfies the aggregation, so no
    * further exchange, checkpoint, or join exists at any series count —
    * the round-8 two-pass shape spilled 23 GB at 10⁶ series in the
    * checkpoint + mapGroups + join stages this fusion deletes.
    *
    * Returns one row per series: (series_id, r_<key> DOUBLE per candidate,
    * null where the candidate has no scorable holdout rows — the same null
    * a full outer join of per-candidate score frames would carry). */
  def scoreFeatureSetsBySeries(frame: DataFrame, alwaysPool: Seq[String],
                               lagPool: Seq[String],
                               candidates: Seq[(String, Seq[String])],
                               h: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val pool = alwaysPool ++ lagPool
    candidates.foreach { case (key, feats) =>
      val lagUsed = feats.filter(lagPool.contains)
      require(feats.forall(pool.contains) && lagUsed == lagPool.take(lagUsed.size),
        s"candidate $key must draw from the pool and use a lagPool prefix")
    }
    // [[withTestFlag]]'s count, kept as a STEP index (h at the series end)
    // so holdout rows pivot into fixed-width per-step columns
    val after = count(when(!col(IsFuture), lit(1)))
      .over(Window.partitionBy(SeriesId).orderBy(Ds)
        .rowsBetween(1, Window.unboundedFollowing))
    val obs = frame.withColumn("_step", lit(h) - after)
      .filter(!col(IsFuture) && col(Y).isNotNull)
      .withColumn("is_test", col("_step") > 0)
    // depth = leading non-null lag count; nested nulls make this the row's
    // full null signature over the pool
    val depth = lagPool.zipWithIndex.foldRight(lit(lagPool.size)) {
      case ((c, i), rest) => when(col(c).isNull, lit(i)).otherwise(rest)
    }
    val xs: Seq[Column] = lit(1.0) +:
      (alwaysPool.map(c => col(c).cast("double")) ++
        lagPool.map(c => coalesce(col(c).cast("double"), lit(0.0))))
    val yD = col(Y).cast("double")
    // candidate feature → pool index (+1 for the intercept at 0), in the
    // candidate's own order so the pivoting path matches a direct fit
    val candIdx: Seq[(String, Array[Int], Int)] = candidates.map { case (key, feats) =>
      val lagCount = feats.count(lagPool.contains)
      (key, (0 +: feats.map(f => pool.indexOf(f) + 1)).toArray, lagCount)
    }
    val lagCounts: Seq[Int] = candIdx.map(_._3).distinct.sorted
    def kOf(l: Int) = 1 + alwaysPool.size + l
    // train moments per depth tier ℓ, truncated to the columns a depth-ℓ
    // candidate can reach
    val momAggs = lagCounts.flatMap { l =>
      val kL = kOf(l)
      val cond = !col("is_test") && depth >= l
      (for (i <- 0 until kL; j <- 0 to i) yield
        sum(when(cond, xs(i) * xs(j))).as(s"sa_${l}_${i}_$j")) ++
        (0 until kL).map(i => sum(when(cond, xs(i) * yD)).as(s"sb_${l}_$i"))
    }
    // holdout pivot: per step, the row's y, lag depth, and pool values
    val stepAggs = (1 to h).flatMap { s =>
      val cond = col("is_test") && col("_step") === s
      sum(when(cond, yD)).as(s"ty_$s") +:
        sum(when(cond, depth.cast("double"))).as(s"td_$s") +:
        pool.indices.map(p => sum(when(cond, xs(p + 1))).as(s"tx_${s}_$p"))
    }
    val aggs = momAggs ++ stepAggs
    val agged = obs.groupBy(SeriesId).agg(aggs.head, aggs.tail: _*)
    // field offsets in the aggregated row (0 = series_id)
    val momOff: Map[Int, Int] = {
      var off = 1
      lagCounts.map { l =>
        val o = l -> off; off += kOf(l) * (kOf(l) + 1) / 2 + kOf(l); o
      }.toMap
    }
    val stepBase = 1 + lagCounts.map(l => kOf(l) * (kOf(l) + 1) / 2 + kOf(l)).sum
    val stepW = 2 + pool.size
    val outSchema = StructType(StructField(SeriesId, StringType) +:
      candidates.map { case (key, _) => StructField(s"r_$key", DoubleType) })
    agged.map { r =>
      val cells: Seq[Any] = candIdx.map { case (_, idx, lagCount) =>
        val o = momOff(lagCount)
        val kL = kOf(lagCount)
        val beta = if (r.isNullAt(o)) Array(Double.NaN)
        else {
          val kk = idx.length
          val a = Array.ofDim[Double](kk, kk)
          val b = new Array[Double](kk)
          for (i <- 0 until kk; j <- 0 until kk) {
            val (hi, lo) = (math.max(idx(i), idx(j)), math.min(idx(i), idx(j)))
            a(i)(j) = r.getDouble(o + hi * (hi + 1) / 2 + lo)
            if (j == 0) b(i) = r.getDouble(o + kL * (kL + 1) / 2 + idx(i))
          }
          solve(a, b)
        }
        var sse = 0.0; var n = 0L
        var s = 0
        while (s < h) {
          val base = stepBase + s * stepW
          // beta is the length-1 NaN sentinel when the series has no train
          // rows at this tier (every row holdout) — skip the step entirely;
          // the score stays null, matching the per-candidate scorer
          if (beta.length == idx.length &&
              !r.isNullAt(base) && r.getDouble(base + 1).toInt >= lagCount) {
            var yhat = beta(0)
            var i = 1
            while (i < idx.length) {
              yhat += beta(i) * r.getDouble(base + 1 + idx(i)); i += 1
            }
            if (!yhat.isNaN) { sse += { val e = yhat - r.getDouble(base); e * e }; n += 1 }
          }
          s += 1
        }
        if (n > 0) java.lang.Double.valueOf(math.sqrt(sse / n)) else null
      }
      Row.fromSeq(r.getString(0) +: cells)
    }(Encoders.row(outSchema)).toDF()
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
