package graft

import graft.functions.DotProduct
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class NativeDotSpec extends SparkSpec {

  test("native dot == interpreted HOF dot on varied shapes, and stays codegen") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq(
      (1L, Array.fill(64)(rnd.nextDouble()), Array.fill(64)(rnd.nextDouble())),
      (2L, Array.fill(8)(rnd.nextDouble()), Array.fill(8)(rnd.nextDouble())),
      (3L, Array.empty[Double], Array.fill(4)(rnd.nextDouble())), // empty side
      (4L, Array.fill(5)(rnd.nextDouble()), Array.fill(3)(rnd.nextDouble())) // unequal
    )
    val df = rows.toDF("id", "a", "b")
    val nat = df.select(col("id"), DotProduct.dotNative(col("a"), col("b")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // equal-length rows: bit-identical to the interpreted HOF form
    val hof = df.filter(col("id") <= 2)
      .select(col("id"), Similarity.dot(col("a"), col("b")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    hof.foreach { case (id, h) =>
      assert(nat(id) == h, s"row $id: native ${nat(id)} != hof $h (must be bit-identical)")
    }
    // unequal lengths: the UDF's min-length semantics (zip_with would null-pad)
    assert(nat(3L) == 0.0, "empty side -> 0.0")
    val exp4 = rows.find(_._1 == 4L).map { case (_, a, b) =>
      (0 until 3).map(i => a(i) * b(i)).sum }.get
    assert(nat(4L) == exp4, "min-length loop over the shorter side")
    // null input -> null out (BinaryExpression null-intercept)
    val nullRow = Seq((5L, null.asInstanceOf[Array[Double]], Array(1.0)))
      .toDF("id", "a", "b")
      .select(DotProduct.dotNative(col("a"), col("b"))).collect()(0)
    assert(nullRow.isNullAt(0), "null array must yield null, not a crash")
    // the cosine re-rank path carries no UDF anywhere in its plan
    val plan = df.select(Similarity.dotFast(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF") && plan.contains("graft_dot"),
      s"dotFast must plan as the native expression, got: $plan")
  }
}
