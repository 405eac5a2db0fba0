package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — for every left row, the right row with the
  * greatest time ≤ the left row's time within the same key (kdb `aj` /
  * DuckDB `ASOF JOIN` / pandas `merge_asof` semantics). The operator Spark
  * lacks natively, composed from what it has:
  *
  * union the two sides, window-partition by key ordered by (time, side),
  * and carry the last non-null right value forward. ONE shuffle keyed by
  * the join key, no range-condition join (a naive `l.t >= r.t` theta-join
  * explodes to |L|·|R| per key and is exactly the all-pairs shape
  * PlanAuditSpec forbids); each key's timeline streams through its window
  * in sorted order, so the plan holds at any row count and any key
  * cardinality. Skewed keys behave like any other window aggregation
  * (AQE handles moderate skew; salt upstream if one key is a large
  * fraction of the data).
  *
  * Right rows must be unique per (key, time) for a deterministic result —
  * pre-aggregate the right side (the declared events_asof_view query takes
  * max(value) per (user, ts)); ties between a left and right row at the
  * SAME time resolve right-first (the ≤ in the contract, matching DuckDB's
  * default `ON l.t >= r.t`).
  */
object AsOf {

  /** Left frame with `valueCols` from the matched right row appended as
    * `<name><suffix>` (null when the key has no right row at-or-before the
    * left time) plus `<timeCol of right><suffix>` carrying the matched
    * right time. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String, valueCols: Seq[String],
               suffix: String = "_asof"): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one equi-key")
    val carried = (rightTime +: valueCols).map(c => s"$c$suffix")
    val leftRest = left.columns.filterNot(keyCols.contains).toSeq
    val l = left
      .withColumn("_at", col(leftTime))
      .withColumn("_side", lit(1))
      .select((keyCols.map(col) ++ Seq(col("_at"), col("_side"))
        ++ leftRest.map(col)
        ++ carried.map(c => lit(null).cast(
          right.schema(c.stripSuffix(suffix)).dataType).as(c))): _*)
    val r = right
      .withColumn("_at", col(rightTime))
      .withColumn("_side", lit(0))
      .select((keyCols.map(col) ++ Seq(col("_at"), col("_side"))
        ++ leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c))
        ++ (rightTime +: valueCols).map(c => col(c).as(s"$c$suffix"))): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_at"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    carried
      .foldLeft(l.unionByName(r))((df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
      .filter(col("_side") === 1)
      .drop("_at", "_side")
  }
}
