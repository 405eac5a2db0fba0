package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** K-minimum-values distinct-count sketch as a native Catalyst
  * `TypedImperativeAggregate` — the bounded-state alternative to an exact
  * `COUNT(DISTINCT ...)` for cardinality estimation over very large groups.
  *
  * The classic KMV estimator (Bar-Yossef et al. 2002 "Counting distinct
  * elements in a data stream"; Beyer et al. 2007 give the (k−1)/u_k form):
  * keep the k smallest DISTINCT uniform hash values; if fewer than k distinct
  * values exist the count is exact, otherwise the k-th smallest normalized
  * hash u_k estimates the cardinality as (k−1)/u_k.
  *
  * Why this instead of `approx_count_distinct` (HLL++): the KMV transform is
  * a pure function of the input's hash set — fully DETERMINISTIC and exactly
  * replayable in ANSI SQL (order the distinct hashes, take the k-th) — so a
  * cross-engine oracle can hash-check the estimate to the last bit, which no
  * engine-internal HLL register layout allows. At 100 TB the properties that
  * matter are the same as HLL's: the aggregation buffer is bounded at k
  * longs per group regardless of group size, partial (map-side) aggregation
  * applies, and merge = union-then-truncate is associative, commutative and
  * order-insensitive.
  *
  * Input: a LONG uniform hash in [0, 2^60) (e.g. the engine's md5-prefix
  * convention `conv(substr(md5(x),1,15),16,10)` — 15 hex chars so the value
  * and its DuckDB `CAST(concat('0x',…) AS BIGINT)` twin are both exact).
  * Output: DOUBLE estimate — exact count when < k distinct values were seen.
  *
  * Scale note: state per group is ≤ k × 8 bytes + TreeSet overhead in the
  * object-hash map, serialized to a flat k×8-byte array between stages; a
  * billion groups carry no more than k longs each through the shuffle.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  /** Hash domain size: 16^15 = 2^60 (15 hex chars of an md5). */
  val HashDomain: Double = 1152921504606846976.0d

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && k >= 2) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct needs a LONG hash column and k >= 2, got ${child.dataType}, k=$k")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(buf: java.util.TreeSet[java.lang.Long]): Unit =
    while (buf.size() > k) buf.pollLast()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // only insert if it could enter the k smallest — keeps updates O(log k)
      if (buf.size() < k || h < buf.last()) { buf.add(h); trim(buf) }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    trim(buf)
    buf
  }

  /** Exact count below k distinct; (k−1)/u_k above, with u_k = h_k/2^60. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size() < k) buf.size().toDouble
    else (k - 1).toDouble / (buf.last().toDouble / HashDomain)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size() * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

/** Bounded deterministic uniform sample: keep the payloads of the k rows
  * with the SMALLEST hash per group — because the hash is uniform and a
  * pure function of the row key, the k-smallest-hash subset IS a uniform
  * random sample of the group, chosen identically under any partitioning,
  * merge order, or engine. The sample-quantile estimator built on it
  * (`percentile` over the emitted array) is therefore exactly replayable
  * in SQL (rank by hash, keep rn ≤ k, quantile_cont) — the deterministic
  * counterpart of reservoir sampling, with KMV's bounded-buffer and
  * mergeable-partial properties. State: k (hash, value) pairs per group.
  */
case class HashSample(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def left: Expression = hash
  override def right: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType && value.dataType == DoubleType && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash_sample needs (LONG hash, DOUBLE value) and k >= 1, got " +
        s"${hash.dataType}, ${value.dataType}, k=$k")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hash_sample"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  private def trim(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Unit =
    while (buf.size() > k) buf.pollLastEntry()

  override def update(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) {
      val hl = h.asInstanceOf[Long]
      if (buf.size() < k || hl < buf.lastKey()) {
        buf.put(hl, v.asInstanceOf[Double]); trim(buf)
      }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      other: java.util.TreeMap[java.lang.Long, java.lang.Double]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    buf.putAll(other); trim(buf); buf
  }

  /** Values ordered by ascending hash (a fixed, partitioning-independent
    * order). */
  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
    val out = new Array[Any](buf.size())
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().doubleValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size() * 16)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); bb.putLong(e.getKey); bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.put(bb.getLong(), bb.getDouble())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HashSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HashSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashSample =
    copy(hash = newLeft, value = newRight)
}

object KmvSketch {
  /** Aggregate Column form: `kmvDistinct(hashCol, k)` — groupBy-able like any
    * built-in aggregate. `hashCol` must already be the engine's 60-bit
    * md5-prefix hash (see [[hash60]]). */
  def kmvDistinct(hash: Column, k: Int): Column =
    GraftColumns.column(
      KmvDistinct(GraftColumns.expression(hash), k).toAggregateExpression())

  /** Aggregate Column form of [[HashSample]]: the payloads of the k
    * smallest-hash rows per group, hash-ascending. */
  def hashSample(hash: Column, value: Column, k: Int): Column =
    GraftColumns.column(
      HashSample(GraftColumns.expression(hash), GraftColumns.expression(value), k)
        .toAggregateExpression())

  /** The engine's cross-engine-stable 60-bit uniform hash of any column:
    * first 15 hex chars of md5 of the value's canonical string form.
    * DuckDB twin: `CAST(concat('0x', substr(md5(CAST(x AS VARCHAR)),1,15)) AS BIGINT)`. */
  def hash60(c: Column): Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
  }
}
