package graft.operators

import graft.core.Joins
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchical forecast reconciliation over a two-level (child → parent →
  * total) aggregation tree — the coherence layer a star-schema forecasting
  * deployment needs: per-nation forecasts, per-region roll-ups, and a grand
  * total that AGREE instead of three independent numbers. Public textbook
  * methods (Hyndman & Athanasopoulos, "Forecasting: Principles and
  * Practice", ch. 11):
  *
  *  - bottom-up: parent/total forecasts = sums of child base forecasts —
  *    coherent by construction;
  *  - top-down (historical proportions): the total's base forecast
  *    disaggregated by each node's share of training volume.
  *
  * Base forecasts here are seasonal-naive (y[t] = y[t − period]), so every
  * output is an exact replay of history — the reconciliation STRUCTURE is
  * the operator; swapping in a model-based base forecast is a frame swap.
  *
  * Scale shape: every level derives from ONE pass over the child history,
  * carried as integer cents (sums are exact integer arithmetic on any
  * engine and partitioning — a raw double sum can straddle a cents
  * boundary); the future spine is series × h rows; all joins key on
  * (series_id, ds). Driver state is the 1-row max-date frame.
  */
object Hierarchy {

  /** Generic reconciliation from caller-supplied BASE forecasts — the
    * model-based entry ([[reconcileSnaive]] is the history-replay special
    * case): any per-level forecast frames (per-nation OLS, hwes, rnn — the
    * engine's whole estimator registry) slot in unchanged. `bottomHist`
    * supplies the top-down proportions; `baseBottom`/`baseParent` are
    * `(series_id, ds, fcst)`, `baseTotal` is `(ds, fcst)` (dollars).
    * Output matches [[reconcileSnaive]]'s shape. Bottom-up parents/total
    * are double sums of the base frame — exact coherence is at double
    * precision here, where the snaive path's cents-space longs are
    * bit-exact. */
  def reconcile(bottomHist: DataFrame, mapping: DataFrame,
                baseBottom: DataFrame, baseParent: DataFrame,
                baseTotal: DataFrame): DataFrame = {
    val bh = bottomHist.select(col("series_id"), col("ds"),
        round(col("y") * 100).cast("long").as("yc"))
      .join(Joins.maybeBroadcast(mapping), Seq("series_id"))
    val ns = bh.groupBy("series_id").agg(sum("yc").as("s"))
    val ps = bh.groupBy(col("parent").as("series_id")).agg(sum("yc").as("s"))
    val ts = bh.agg(sum("yc").as("st"))
    val fb = baseBottom.join(Joins.maybeBroadcast(mapping), Seq("series_id"))
    val ft = baseTotal.select(col("ds"), col("fcst").as("tf"))
    val buP = fb.groupBy(col("parent").as("series_id"), col("ds"))
      .agg(sum("fcst").as("bu"))
    val buT = fb.groupBy("ds").agg(sum("fcst").as("bu"))
    def td(tf: Column, s: Column, st: Column): Column =
      round(tf * (s.cast("double") / st), 2)
    val nation = fb.join(ft, Seq("ds")).join(ns, Seq("series_id"))
      .crossJoin(broadcast(ts))
      .select(lit("nation").as("level"), col("series_id"), col("ds"),
        round(col("fcst"), 2).as("fcst_base"),
        round(col("fcst"), 2).as("fcst_bu"),
        td(col("tf"), col("s"), col("st")).as("fcst_td"))
    val region = baseParent.join(ft, Seq("ds"))
      .join(buP, Seq("series_id", "ds")).join(ps, Seq("series_id"))
      .crossJoin(broadcast(ts))
      .select(lit("region").as("level"), col("series_id"), col("ds"),
        round(col("fcst"), 2).as("fcst_base"),
        round(col("bu"), 2).as("fcst_bu"),
        td(col("tf"), col("s"), col("st")).as("fcst_td"))
    val total = ft.join(buT, Seq("ds"))
      .select(lit("total").as("level"), lit("TOTAL").as("series_id"), col("ds"),
        round(col("tf"), 2).as("fcst_base"),
        round(col("bu"), 2).as("fcst_bu"),
        round(col("tf"), 2).as("fcst_td"))
    nation.unionByName(region).unionByName(total)
  }

  /** `bottom`: child history `(series_id, ds DATE, y)`; `mapping`:
    * `(series_id, parent)` (small dimension frame — size-gated broadcast).
    * Returns `(level, series_id, ds, fcst_base, fcst_bu, fcst_td)` for h
    * periods past the last observed month, 2-dp dollars at every level
    * (nation rows: bu == base by definition; total rows: td == base). */
  def reconcileSnaive(bottom: DataFrame, mapping: DataFrame,
                      period: Int, h: Int): DataFrame = {
    val bh = bottom.select(col("series_id"), col("ds"),
        round(col("y") * 100).cast("long").as("yc"))
      .join(Joins.maybeBroadcast(mapping), Seq("series_id"))
      .localCheckpoint(false)
    val ph = bh.groupBy(col("parent").as("series_id"), col("ds"))
      .agg(sum("yc").as("yc"))
    val th = bh.groupBy(col("ds")).agg(sum("yc").as("yc"))
      .withColumn("series_id", lit("TOTAL"))
    // future month spine off the global last observed month (1-row agg →
    // the broadcast build side of every spine join)
    val fut = bh.agg(max("ds").as("d0"))
      .select(explode(sequence(lit(1), lit(h))).as("k"), col("d0"))
      .select(add_months(col("d0"), col("k")).as("ds"))
    def snaive(hist: DataFrame, ids: DataFrame): DataFrame =
      ids.crossJoin(broadcast(fut))
        .join(hist.select(col("series_id"),
            add_months(col("ds"), period).as("ds"), col("yc").as("fc")),
          Seq("series_id", "ds"), "left")
    val fb = snaive(bh, bh.select("series_id", "parent").distinct())
    val fp = snaive(ph, ph.select("series_id").distinct())
    val ft = snaive(th, th.select("series_id").distinct())
      .select(col("ds"), col("fc").as("tfc"))
    val ns = bh.groupBy("series_id").agg(sum("yc").as("s"))
    val ps = bh.groupBy(col("parent").as("series_id")).agg(sum("yc").as("s"))
    val ts = bh.agg(sum("yc").as("st"))
    val buP = fb.groupBy(col("parent").as("series_id"), col("ds"))
      .agg(sum("fc").as("bu"))
    val buT = fb.groupBy("ds").agg(sum("fc").as("bu"))
    // double arithmetic mirrors the SQL oracle term for term:
    // (total_cents / 100.0) * (node_cents / total_train_cents)
    def td(tfc: Column, s: Column, st: Column): Column =
      round((tfc / lit(100.0)) * (s.cast("double") / st), 2)
    val nation = fb.join(ft, Seq("ds")).join(ns, Seq("series_id"))
      .crossJoin(broadcast(ts))
      .select(lit("nation").as("level"), col("series_id"), col("ds"),
        round(col("fc") / 100.0, 2).as("fcst_base"),
        round(col("fc") / 100.0, 2).as("fcst_bu"),
        td(col("tfc"), col("s"), col("st")).as("fcst_td"))
    val region = fp.join(ft, Seq("ds")).join(buP, Seq("series_id", "ds"))
      .join(ps, Seq("series_id")).crossJoin(broadcast(ts))
      .select(lit("region").as("level"), col("series_id"), col("ds"),
        round(col("fc") / 100.0, 2).as("fcst_base"),
        round(col("bu") / 100.0, 2).as("fcst_bu"),
        td(col("tfc"), col("s"), col("st")).as("fcst_td"))
    val total = ft.join(buT, Seq("ds"))
      .select(lit("total").as("level"), lit("TOTAL").as("series_id"), col("ds"),
        round(col("tfc") / 100.0, 2).as("fcst_base"),
        round(col("bu") / 100.0, 2).as("fcst_bu"),
        round(col("tfc") / 100.0, 2).as("fcst_td"))
    nation.unionByName(region).unionByName(total)
  }
}
