package graft

import graft.eval.AutoSelect
import graft.operators.Imputer
import org.apache.spark.sql.functions._

class ImputerExtrasSpec extends SparkSpec {

  test("dropLeadingNulls removes only the leading null run") {
    val df = seriesOf(Seq(None, None, Some(1.0), None, Some(2.0)))
    val out = Imputer.dropLeadingNulls(df)
    assert(out.count() === 3)
    assert(out.filter(col("y").isNull).count() === 1) // interior null kept
  }

  test("imputePool draws from the preceding window deterministically") {
    val df = seriesOf(Seq(Some(1.0), Some(2.0), Some(3.0), None))
    val out1 = col1(Imputer.imputePool(df, 3), "y")
    val out2 = col1(Imputer.imputePool(df, 3), "y")
    assert(out1 === out2)
    assert(Seq(1.0, 2.0, 3.0).contains(out1.last))
  }

  test("imputation noise only perturbs imputed cells and is seeded") {
    val df = seriesOf(Seq(Some(10.0), Some(12.0), None, Some(14.0)))
      .withColumn("was_missing", col("y").isNull)
    val filled = Imputer.linearInterp(df)
    val noised = Imputer.withImputationNoise(filled, col("was_missing"))
    val vals = col1(noised, "y")
    assert(vals(0) === 10.0 && vals(1) === 12.0 && vals(3) === 14.0)
    assert(vals(2) !== 13.0) // perturbed
  }

  test("autoVarOrder returns an order within bounds on a cross-lagged pair") {
    val y1 = (0 until 40).map(t => 10.0 + t + ((t * 13) % 5))
    val y2 = 0.0 +: y1.dropRight(1).map(_ * 0.5)
    val df = obsSeries(y1, "a").unionByName(obsSeries(y2, "b"))
    val (p, aic) = AutoSelect.autoVarOrder(df, Seq("a", "b"), maxP = 2)
    assert(p >= 1 && p <= 2 && !aic.isNaN)
  }
}
