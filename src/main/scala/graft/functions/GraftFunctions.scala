package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for graft's native Catalyst expressions — the
  * `SparkSessionExtensions` tier of the charter's custom-operator ladder.
  *
  * Two registration paths, same builders:
  *
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions` injects
  *    the functions at session build (the standard library-extension hook);
  *  - live session: [[GraftFunctions.register]] adds them to an existing
  *    session's function registry (tests, notebooks, long-lived services).
  *
  * After either, plain SQL can call them:
  * {{{
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  *   SELECT hour, kmv_distinct(h, 16) FROM hashed GROUP BY hour
  *   SELECT g, inline(topk_pairs(w, id, 3)) FROM scores GROUP BY g
  * }}}
  *
  * Aggregate builders return the raw `AggregateFunction`; the analyzer
  * wraps it into an `AggregateExpression` exactly as it does for built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  private def intLit(e: Expression, name: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name: $arg must be an INT literal, got $other")
  }

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$name takes exactly $n arguments, got ${args.length}")

  /** (identifier, info, builder) triples in SparkSessionExtensions'
    * injectFunction shape. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (args: Seq[Expression]) => {
        arity("graft_dot", args, 2); DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getCanonicalName, "kmv_distinct"),
      (args: Seq[Expression]) => {
        arity("kmv_distinct", args, 2)
        KmvDistinct(args(0), intLit(args(1), "kmv_distinct", "k"))
      }),
    (FunctionIdentifier("hash_sample"),
      new ExpressionInfo(classOf[HashSample].getCanonicalName, "hash_sample"),
      (args: Seq[Expression]) => {
        arity("hash_sample", args, 3)
        HashSample(args(0), args(1), intLit(args(2), "hash_sample", "k"))
      }),
    (FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getCanonicalName, "topk_pairs"),
      (args: Seq[Expression]) => {
        arity("topk_pairs", args, 3)
        TopKPairs(args(0), args(1), intLit(args(2), "topk_pairs", "k"))
      }),
    // Spark's runtime-join-filter Bloom expressions, surfaced to SQL: the
    // engine-internal pair (`BloomFilterAggregate` build over LONG hashes,
    // `BloomFilterMightContain` probe) has no public SQL names upstream —
    // registering them lets plain SQL build the semi-join prefilter that
    // Decontaminate.contaminatedPairsBloom plans from the DataFrame side:
    //   SELECT bloom_build(xxhash64(key), 1000000, 8388608) FROM bench
    //   ... WHERE bloom_probe((SELECT ...), xxhash64(key))
    (FunctionIdentifier("bloom_build"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]
          .getCanonicalName, "bloom_build"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 3,
          s"bloom_build takes (hash) or (hash, expectedItems, numBits), got ${args.length}")
        if (args.length == 1)
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(args(0))
        else
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            args(0), args(1), args(2))
      }),
    (FunctionIdentifier("bloom_probe"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]
          .getCanonicalName, "bloom_probe"),
      (args: Seq[Expression]) => {
        arity("bloom_probe", args, 2)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1))
      }),
    // ---- forecasting primitives (the series tier's SQL surface) ----------
    // exact pooled/grouped OLS as an aggregate: beta array, intercept first
    (FunctionIdentifier("graft_ols_fit"),
      new ExpressionInfo(classOf[OlsFit].getCanonicalName, "graft_ols_fit"),
      (args: Seq[Expression]) => {
        arity("graft_ols_fit", args, 2); OlsFit(args(0), args(1))
      }),
    // scalar twin: beta[1] + ⟨beta[2..], x⟩ via the native DotProduct —
    // raw Catalyst composition (builders must return resolvable
    // expressions, not Column-API node wrappers)
    (FunctionIdentifier("graft_ols_predict"),
      new ExpressionInfo(classOf[OlsFit].getCanonicalName, "graft_ols_predict"),
      (args: Seq[Expression]) => {
        arity("graft_ols_predict", args, 2)
        import org.apache.spark.sql.catalyst.expressions._
        val beta = args(0)
        Add(ElementAt(beta, Literal(1)),
          DotProduct(Slice(beta, Literal(2), Subtract(Size(beta), Literal(1))),
            args(1)))
      }),
    // the h-step recursive dynamic AR forecast as a TABLE function:
    //   LATERAL VIEW graft_forecast(hist, beta, 3, 12) f AS step, yhat
    // (the Generator tier — each step consumes the walk's own predictions,
    // so no scalar/aggregate can express it; see [[GraftForecast]])
    (FunctionIdentifier("graft_forecast"),
      new ExpressionInfo(classOf[GraftForecast].getCanonicalName, "graft_forecast"),
      (args: Seq[Expression]) => {
        arity("graft_forecast", args, 4)
        GraftForecast(args(0), args(1),
          intLit(args(2), "graft_forecast", "lags"),
          intLit(args(3), "graft_forecast", "h"))
      }),
    // seasonal naive as a window function: graft_snaive(y, m) OVER (...) —
    // the m-back actual, the reference's snaive fitted/1-cycle-horizon value
    (FunctionIdentifier("graft_snaive"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.Lag].getCanonicalName,
        "graft_snaive"),
      (args: Seq[Expression]) => {
        arity("graft_snaive", args, 2)
        org.apache.spark.sql.catalyst.expressions.Lag(
          args(0), args(1), Literal(null), ignoreNulls = false)
      })) ++ metricFns

  /** The §2.6 metric aggregates as SQL functions (graft_rmse(y, yhat), ...):
    * each builder composes the [[Metrics]] definition from raw Catalyst
    * nodes (Column-API wrappers don't resolve through the function
    * registry), so `SELECT graft_rmse(y, yhat) ... GROUP BY model` scores
    * models from plain SQL with the identical single-pass math. */
  private def metricFns: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.types.DoubleType
    def ag(f: AggregateFunction): Expression = f.toAggregateExpression()
    val ms: Seq[(String, (Expression, Expression) => Expression)] = Seq(
      "bias" -> ((a, f) => ag(Sum(Subtract(f, a)))),
      "abias" -> ((a, f) => Abs(ag(Sum(Subtract(f, a))))),
      "mse" -> ((a, f) => ag(Average(Pow(Subtract(f, a), Literal(2.0))))),
      "rmse" -> ((a, f) => Sqrt(ag(Average(Pow(Subtract(f, a), Literal(2.0)))))),
      "mae" -> ((a, f) => ag(Average(Abs(Subtract(f, a))))),
      "smape" -> ((a, f) => ag(Average(Divide(
        Multiply(Literal(2.0), Abs(Subtract(f, a))), Add(Abs(a), Abs(f)))))),
      "r2" -> { (a, f) =>
        val sse = ag(Sum(Pow(Subtract(f, a), Literal(2.0))))
        val sst = Subtract(ag(Sum(Pow(a, Literal(2.0)))),
          Divide(Pow(ag(Sum(a)), Literal(2.0)),
            Cast(ag(Count(Seq(a))), DoubleType)))
        Subtract(Literal(1.0), Divide(sse, sst))
      },
      // NULL when any actual is 0 (the reference's NaN), else mean |f−a|/|a|
      // with the division guarded per row — Metrics.mape's exact shape
      "mape" -> { (a, f) =>
        val anyZero = EqualTo(
          ag(Max(CaseWhen(Seq((EqualTo(a, Literal(0.0)), Literal(1))), Literal(0)))),
          Literal(1))
        val safeAvg = ag(Average(CaseWhen(
          Seq((Not(EqualTo(a, Literal(0.0))), Abs(Divide(Subtract(f, a), a)))), None)))
        CaseWhen(Seq((anyZero, Cast(Literal(null), DoubleType))), Some(safeAvg))
      })
    ms.map { case (name, f) =>
      (FunctionIdentifier(s"graft_$name"),
        new ExpressionInfo(Metrics.getClass.getCanonicalName, s"graft_$name"),
        (args: Seq[Expression]) => {
          arity(s"graft_$name", args, 2)
          f(args(0), args(1))
        })
    }
  }

  /** Register every graft function into a LIVE session's registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      GraftColumns.registerFunction(spark, ident, info, builder)
    }
}
