package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product over two `array<double>` columns — the top
  * tier of the charter's custom-operator preference order (native Catalyst
  * `Expression` > Scala UDF > interpreted higher-order functions).
  *
  * Identical left-to-right summation over `min(|a|, |b|)` elements as the
  * `aggregate(zip_with(...))` form and the previous Scala UDF, but the
  * generated code is one primitive loop over the columnar `ArrayData` —
  * no per-element interpreted lambda (the HOF: measured ~50× slower on
  * multi-million-candidate re-ranks) and no per-row boxing of both arrays
  * into JVM `Array[Double]` through the UDF serializer. Because the column
  * wraps the expression directly ([[ExpressionUtils.column]]), no session
  * registration or `SparkSessionExtensions` is needed, and the expression
  * participates in whole-stage codegen alongside the surrounding
  * projection arithmetic.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs two array<double> inputs, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotN")
      val i = ctx.freshName("dotI")
      val s = ctx.freshName("dotS")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column form: `dotNative(a, b)` — usable anywhere a Column is. */
  def dotNative(a: Column, b: Column): Column =
    GraftColumns.column(
      DotProduct(GraftColumns.expression(a), GraftColumns.expression(b)))
}
