package graft

import graft.functions.Metrics
import org.apache.spark.sql.functions._

/** Known-answer tests from the reference's metric docstrings
  * (/root/reference/src/scalecast/Metrics.py, FIXTURES.md §6). */
class MetricsSpec extends SparkSpec {
  import scala.math.sqrt

  private def eval(a: Seq[Double], f: Seq[Double], m: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double = {
    import spark.implicits._
    val df = a.zip(f).toDF("a", "f")
    df.agg(m(col("a"), col("f"))).first().getDouble(0)
  }

  val a = Seq(1.0, 2, 3, 4, 5)
  val f = Seq(1.0, 2, 3, 4, 6)

  test("bias = 1")  { assert(eval(a, f, Metrics.bias) === 1.0) }
  test("abias = 1") { assert(eval(a, f, Metrics.abias) === 1.0) }
  test("mae = 0.2") { assert(eval(a, f, Metrics.mae) === 0.2) }
  test("mse = 0.2") { assert(eval(a, f, Metrics.mse) === 0.2) }
  test("rmse = sqrt(0.2)") { assert(math.abs(eval(a, f, Metrics.rmse) - sqrt(0.2)) < 1e-12) }
  test("r2 = 1 - sse/sst") {
    // sse = 1; sst = sum((a - 3)^2) = 10
    assert(math.abs(eval(a, f, Metrics.r2) - 0.9) < 1e-12)
  }
  test("smape matches M4 definition") {
    val expected = a.zip(f).map { case (x, y) => 2 * math.abs(y - x) / (math.abs(x) + math.abs(y)) }.sum / a.size
    assert(math.abs(eval(a, f, Metrics.smape) - expected) < 1e-12)
  }
  test("mape guards a==0 with null") {
    import spark.implicits._
    val df = Seq((0.0, 1.0), (2.0, 2.0)).toDF("a", "f")
    val r = df.agg(Metrics.mape(col("a"), col("f"))).first()
    assert(r.isNullAt(0))
  }
  test("msis known answer = 5.0 (Metrics.py:226-233)") {
    import spark.implicits._
    // a=[1..5]? reference: obs=[-5..0], m=1; a/f/uf/lf over 5 steps
    val a2 = Seq(1.0, 2, 3, 4, 5)
    val uf = Seq(1.5, 2.5, 3.5, 4.5, 6.5)
    val lf = Seq(0.5, 1.5, 2.5, 3.5, 5.5)
    val df = a2.indices.map(i => (a2(i), uf(i), lf(i))).toDF("a", "uf", "lf")
    val num = df.agg(Metrics.msisNumerator(col("a"), col("uf"), col("lf"), 0.05)).first().getDouble(0)
    // obs = [-5,-4,-3,-2,-1,0], m=1 → mean |diff| = 1 → msis = num / 1
    // reference result: 5.0 — interval score: width 1 everywhere, one miss at step 5 by 0.5*40/... recompute:
    // step5: a=5, uf=6.5, lf=5.5 → a < lf → penalty (5.5-5)*40 = 20; widths sum=5 → (5+20)/5 = 5.0
    assert(math.abs(num - 5.0) < 1e-12)
  }
}
