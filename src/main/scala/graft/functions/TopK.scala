package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state top-k aggregate: `topk_pairs(weight, id, k)` keeps the k
  * largest `(weight DESC, id ASC)` pairs per group — a native Catalyst
  * `TypedImperativeAggregate` replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY w DESC, id)` + `rank <= k`
  * idiom.
  *
  * Why it matters at 100 TB: the window form shuffles EVERY input row to its
  * group's partition and sorts the whole partition before discarding all but
  * k rows; a heavy-hitter group pays its full row count in shuffle bytes and
  * sort time. This aggregate keeps a k-entry buffer per group, so map-side
  * partial aggregation reduces each partition to ≤ k pairs per group before
  * the exchange — shuffle volume is `groups × k`, independent of skew, and
  * no sort ever materializes. Merge (union, re-truncate) is associative,
  * commutative and order-insensitive, so the result is deterministic under
  * any partitioning — the tie order (weight DESC, id ASC) is total.
  *
  * Output: `array<struct<rank BIGINT, id BIGINT, w BIGINT>>` ordered best
  * first — `inline`/`explode` it back to rows.
  */
case class TopKPairs(
    weight: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] {

  override def left: Expression = weight
  override def right: Expression = id

  /** Ordering inside the buffer: best pair FIRST (largest weight, then
    * smallest id) so truncation drops the worst (`pollLast`). */
  private val ord: java.util.Comparator[(Long, Long)] = TopKPairs.PairOrd

  override def checkInputDataTypes(): TypeCheckResult =
    if (weight.dataType == LongType && id.dataType == LongType && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs needs LONG weight and LONG id and k >= 1, got " +
        s"${weight.dataType}, ${id.dataType}, k=$k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("w", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  private def trim(buf: java.util.TreeSet[(Long, Long)]): Unit =
    while (buf.size() > k) buf.pollLast()

  override def update(
      buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val w = weight.eval(input)
    val i = id.eval(input)
    if (w != null && i != null) {
      val pair = (w.asInstanceOf[Long], i.asInstanceOf[Long])
      if (buf.size() < k || ord.compare(pair, buf.last()) < 0) {
        buf.add(pair); trim(buf)
      }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    buf.addAll(other); trim(buf); buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val rows = new Array[Any](buf.size())
    val it = buf.iterator()
    var r = 0
    while (it.hasNext) {
      val (w, i) = it.next()
      rows(r) = InternalRow((r + 1).toLong, i, w)
      r += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size() * 16)
    val it = buf.iterator()
    while (it.hasNext) { val (w, i) = it.next(); bb.putLong(w); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add((bb.getLong(), bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(weight = newLeft, id = newRight)
}

object TopKPairs {
  /** (weight DESC, id ASC) — best pair first; serializable because the
    * aggregate (and thus its buffer comparator) ships to executors. */
  object PairOrd extends java.util.Comparator[(Long, Long)] with Serializable {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}

object TopK {
  /** Aggregate Column form: the k largest (weight DESC, id ASC) pairs per
    * group as `array<struct<rank, id, w>>`, best first. */
  def topkPairs(weight: Column, id: Column, k: Int): Column =
    GraftColumns.column(
      TopKPairs(GraftColumns.expression(weight), GraftColumns.expression(id), k)
        .toAggregateExpression())
}
