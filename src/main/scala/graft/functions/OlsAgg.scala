package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact OLS fit as a native Catalyst aggregate — the SQL surface of the
  * engine's closed-form solver ([[graft.models.Ols]] /
  * [[graft.models.GroupedOls]]): `graft_ols_fit(y, array(x1, ..., xk))`
  * accumulates the normal-equation moments (X'X upper triangle + X'y,
  * intercept column implicit) and solves at eval time, returning the beta
  * array with the intercept at index 1 (SQL 1-based via `element_at`).
  * Pair with `graft_ols_predict(beta, array(x...))` for the scalar side.
  *
  * Same scale shape as every moments fit here: the buffer is
  * (k+1)(k+2)/2 + (k+1) doubles regardless of group size, partial
  * aggregation applies, merge is elementwise addition — so
  * `GROUP BY series_id` fits a million series in one shuffle, the
  * [[graft.models.GroupedOls.fitBySeries]] plan from plain SQL. Rows with a
  * null/NaN y, a null array, or any null element are skipped (the train
  * slice semantics of [[graft.models.Ols.fit]]). A group with no usable
  * rows (or a singular system) yields non-finite betas, surfacing as NaN
  * predictions — the per-series skip policy.
  */
case class OlsFit(
    y: Expression,
    xs: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[OlsFit.Moments]
  with BinaryLike[Expression] {

  override def left: Expression = y
  override def right: Expression = xs

  override def checkInputDataTypes(): TypeCheckResult = (y.dataType, xs.dataType) match {
    case (DoubleType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ols_fit needs (DOUBLE, ARRAY<DOUBLE>), got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_ols_fit"

  override def createAggregationBuffer(): OlsFit.Moments = new OlsFit.Moments

  override def update(buf: OlsFit.Moments, input: InternalRow): OlsFit.Moments = {
    val yv = y.eval(input)
    val xv = xs.eval(input)
    if (yv != null && xv != null) {
      val yd = yv.asInstanceOf[Double]
      if (!yd.isNaN) {
        val arr = xv.asInstanceOf[ArrayData]
        val d = arr.numElements()
        var i = 0
        var ok = true
        val x = new Array[Double](d + 1)
        x(0) = 1.0
        while (ok && i < d) {
          if (arr.isNullAt(i)) ok = false
          else {
            val v = arr.getDouble(i)
            if (v.isNaN) ok = false else x(i + 1) = v
          }
          i += 1
        }
        if (ok) buf.add(x, yd)
      }
    }
    buf
  }

  override def merge(buf: OlsFit.Moments, other: OlsFit.Moments): OlsFit.Moments = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: OlsFit.Moments): Any =
    new GenericArrayData(buf.solve())

  override def serialize(buf: OlsFit.Moments): Array[Byte] = {
    val k = buf.k
    val bb = ByteBuffer.allocate(4 + (if (k < 0) 0 else (buf.a.length + buf.b.length) * 8))
    bb.putInt(k)
    if (k >= 0) { buf.a.foreach(bb.putDouble); buf.b.foreach(bb.putDouble) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): OlsFit.Moments = {
    val bb = ByteBuffer.wrap(bytes)
    val m = new OlsFit.Moments
    val k = bb.getInt
    if (k >= 0) {
      m.init(k)
      var i = 0
      while (i < m.a.length) { m.a(i) = bb.getDouble; i += 1 }
      i = 0
      while (i < m.b.length) { m.b(i) = bb.getDouble; i += 1 }
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OlsFit =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OlsFit =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): OlsFit =
    copy(y = newLeft, xs = newRight)
}

object OlsFit {

  /** Normal-equation moments over (1, x₁..xₖ): upper triangle of X'X
    * row-major in `a`, X'y in `b`. `k` = feature count excluding the
    * intercept; −1 until the first row fixes the width. */
  final class Moments extends Serializable {
    var k: Int = -1
    var a: Array[Double] = null
    var b: Array[Double] = null

    def init(kk: Int): Unit = {
      k = kk
      val n = k + 1
      a = new Array[Double](n * (n + 1) / 2)
      b = new Array[Double](n)
    }

    /** x includes the leading 1. */
    def add(x: Array[Double], y: Double): Unit = {
      if (k < 0) init(x.length - 1)
      require(x.length - 1 == k,
        s"graft_ols_fit: inconsistent feature array length ${x.length - 1} vs $k")
      var idx = 0
      var i = 0
      while (i < x.length) {
        var j = 0
        while (j <= i) { a(idx) += x(i) * x(j); idx += 1; j += 1 }
        b(i) += x(i) * y
        i += 1
      }
    }

    def mergeFrom(o: Moments): Unit = {
      if (o.k >= 0) {
        if (k < 0) init(o.k)
        require(k == o.k, s"graft_ols_fit: merging widths $k vs ${o.k}")
        var i = 0
        while (i < a.length) { a(i) += o.a(i); i += 1 }
        i = 0
        while (i < b.length) { b(i) += o.b(i); i += 1 }
      }
    }

    /** Solve Aβ = b (Gaussian elimination with partial pivoting — the
      * [[graft.models.GroupedOls.solve]] kernel). Empty group → NaNs. */
    def solve(): Array[Double] = {
      if (k < 0) return Array(Double.NaN)
      val n = k + 1
      val full = Array.tabulate(n, n) { (i, j) =>
        val (hi, lo) = (math.max(i, j), math.min(i, j))
        a(hi * (hi + 1) / 2 + lo)
      }
      graft.models.GroupedOls.sqlSolve(full, b.clone)
    }
  }
}
