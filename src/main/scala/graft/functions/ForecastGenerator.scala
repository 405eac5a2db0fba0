package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

/** `graft_forecast(history, beta, lags, h)` — the h-step RECURSIVE dynamic
  * AR forecast as a native Catalyst table-generating expression (SURVEY §4's
  * `Generator` entry point): the one scalecast primitive the SQL surface
  * still lacked, because each step's AR features are the model's OWN earlier
  * predictions (/root/reference/src/scalecast/models.py:109-149) — not
  * expressible as a per-row scalar or an aggregate.
  *
  * Shape: one INPUT row per series (its trailing `lags` actuals in time
  * order + the intercept-first OLS beta from `graft_ols_fit`), `h` OUTPUT
  * rows (step, yhat) — `LATERAL VIEW graft_forecast(...)` fans the walk out
  * per series exactly like [[graft.models.Recursive]]'s scorer path does in
  * `flatMapGroups`: the sequential walk runs inside an executor task with
  * state bounded at (lags + h) doubles, series parallelize across the
  * cluster, and NO per-step job barrier or driver loop exists at any series
  * count. Step k scores β₀ + Σᵢ βᵢ·v[t+k−i] with v = actuals ∪ own
  * predictions — the identical ledger walk (and the identical DuckDB
  * recursive-CTE oracle shape) as the Scala-API twin.
  *
  * Nulls: a null history/beta row, a short history (< lags values), or a
  * null element inside either array yields NO output rows for that series —
  * the per-series skip policy (the Scala path's NaN-scored rows filter out
  * the same way).
  */
case class GraftForecast(history: Expression, beta: Expression,
                         lags: Int, h: Int)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(history, beta)

  override def checkInputDataTypes(): TypeCheckResult =
    (history.dataType, beta.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        if (lags >= 1 && h >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_forecast needs lags >= 1 and h >= 1, got ($lags, $h)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_forecast needs (array<double> history, array<double> beta), got $l and $r")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("step", IntegerType, nullable = false),
    StructField("yhat", DoubleType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val hv = history.eval(input)
    val bv = beta.eval(input)
    if (hv == null || bv == null) return Iterator.empty
    val ha = hv.asInstanceOf[ArrayData]
    val ba = bv.asInstanceOf[ArrayData]
    if (ha.numElements() < lags || ba.numElements() < lags + 1) return Iterator.empty
    // ledger: the last `lags` actuals, then predictions as they land —
    // v(0) is the most recent value, the reference's series.append walk
    val v = new Array[Double](lags + h)
    var i = 0
    while (i < lags) {
      val at = ha.numElements() - 1 - i
      if (ha.isNullAt(at)) return Iterator.empty
      v(lags - 1 - i) = ha.getDouble(at)
      i += 1
    }
    val b = new Array[Double](lags + 1)
    i = 0
    while (i <= lags) {
      if (ba.isNullAt(i)) return Iterator.empty
      b(i) = ba.getDouble(i)
      i += 1
    }
    val out = new Array[InternalRow](h)
    var k = 0
    while (k < h) {
      var yhat = b(0)
      var l = 1
      while (l <= lags) { yhat += b(l) * v(lags + k - l); l += 1 }
      v(lags + k) = yhat
      out(k) = InternalRow(k + 1, yhat)
      k += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftForecast =
    copy(history = newChildren(0), beta = newChildren(1))

  override def prettyName: String = "graft_forecast"
}
