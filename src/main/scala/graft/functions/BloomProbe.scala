package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen Bloom-filter membership probe over an executor-cached
  * broadcast — the [[DotProduct]] finish applied to the candidate-prune
  * filters (UDF → native `Expression`).
  *
  * Why not Catalyst's own `BloomFilterMightContain`: its filter rides a
  * scalar-subquery LITERAL, which every probe task deserializes anew —
  * measured 2.1× WORSE end-to-end on cc_clusters_lsh at 2×10⁷ docs
  * (8000 sized partitions × a 16 MB blob; SURVEY §2.9.11). A plain
  * `sparkContext.broadcast` is fetched and deserialized ONCE per executor
  * by the block manager, which is the property the prune's economics rest
  * on. The round-11 probe kept that broadcast but paid a Scala UDF per
  * row (boxing + an interpreted call, a codegen fence in the middle of
  * the signature scan); here the generated code reads the broadcast into
  * a per-instance field at init and probes inline, so the filter scan
  * stays one whole-stage-codegen span.
  *
  * The expression holds the `Broadcast` handle itself (broadcasts are
  * serializable and ship in the task closure by design); `value()` runs
  * once in the generated class's constructor path, not per row.
  */
case class BloomMightContainLong(child: Expression,
                                 bloom: Broadcast[BloomFilter])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain needs a bigint input, got $t")
  }

  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloom,
      classOf[Broadcast[_]].getName)
    val filterCls = classOf[BloomFilter].getName
    // one broadcast deserialize per generated-class instance (= per task
    // attempt at most; the block-manager cache makes it once per executor)
    val filterVar = ctx.addMutableState(filterCls, "graftBloomFilter",
      v => s"$v = ($filterCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $filterVar.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomProbe {
  /** Column form: true iff the filter might contain the bigint column. */
  def mightContainLong(c: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftColumns.column(
      BloomMightContainLong(GraftColumns.expression(c), bloom))
}
