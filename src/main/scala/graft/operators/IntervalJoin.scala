package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed interval (range) join — all (left, right) pairs within the
  * same key whose times satisfy `rightTime ∈ (leftTime + minDelta,
  * leftTime + maxDelta]` (the Flink interval-join / windowed-funnel
  * primitive). Spark plans a raw `l.t < r.t AND r.t <= l.t + Δ` predicate
  * as a per-key theta-join — |L|·|R| work per key, the all-pairs shape
  * PlanAuditSpec forbids — so this operator BUCKETIZES time instead:
  *
  * each right row keys by its time bucket `floor(t / W)` with
  * `W = maxDelta − minDelta`; each left row explodes to the ≤ 2 buckets
  * its window can touch; the join is a plain equi-join on (key, bucket)
  * re-checked by the exact range predicate. Left fan-out is bounded by 2,
  * candidate pairs by the true matches plus one bucket's worth of slack —
  * linear in the data at any scale, one shuffle keyed (key, bucket).
  */
object IntervalJoin {

  /** Columns: every left column, then the right frame's `rightTime` and
    * `valueCols` suffixed `_r`. Inner-join semantics (unmatched left rows
    * drop). `minDelta`/`maxDelta` are in the time columns' own units. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTime: String, rightTime: String,
                   valueCols: Seq[String], minDelta: Long, maxDelta: Long,
                   suffix: String = "_r"): DataFrame = {
    require(maxDelta > minDelta, "empty interval: need maxDelta > minDelta")
    require(keyCols.nonEmpty, "interval join needs at least one equi-key")
    val w = maxDelta - minDelta
    val l = left.withColumn("_bin",
      explode(sequence(
        floor((col(leftTime) + lit(minDelta)) / lit(w)).cast("long"),
        floor((col(leftTime) + lit(maxDelta)) / lit(w)).cast("long"))))
    val r = right
      .select((keyCols.map(col) ++ (rightTime +: valueCols).map(c =>
        col(c).as(s"$c$suffix"))): _*)
      .withColumn("_bin", floor(col(s"$rightTime$suffix") / lit(w)).cast("long"))
    l.join(r, keyCols :+ "_bin")
      .filter(col(s"$rightTime$suffix") > col(leftTime) + lit(minDelta) &&
        col(s"$rightTime$suffix") <= col(leftTime) + lit(maxDelta))
      .drop("_bin")
  }
}
