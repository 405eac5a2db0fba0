package graft

import graft.functions.{GraftExtensions, GraftFunctions}
import org.apache.spark.sql.SparkSessionExtensions

/** SQL registration of the native expressions ([[GraftFunctions]]): the
  * builders evaluate correctly from plain `spark.sql`, aggregates analyze
  * (the raw AggregateFunction wraps like a built-in), and the
  * SparkSessionExtensions hook applies without error. */
class SqlSurfaceSpec extends SparkSpec {

  test("graft functions run from SQL after live registration") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0) === 11.0)

    import spark.implicits._
    Seq((1, 10L, 100L), (1, 20L, 101L), (1, 5L, 102L), (2, 7L, 200L))
      .toDF("g", "w", "id").createOrReplaceTempView("sql_scores")
    val top = spark.sql(
      "SELECT g, inline(topk_pairs(w, id, 2)) FROM sql_scores GROUP BY g")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(top === Set((1, 1L, 101L, 20L), (1, 2L, 100L, 10L), (2, 1L, 200L, 7L)))

    spark.range(200).selectExpr("id",
      "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT) AS h")
      .createOrReplaceTempView("sql_hashed")
    val est = spark.sql("SELECT kmv_distinct(h, 16) FROM sql_hashed").head().getDouble(0)
    assert(est > 100.0 && est < 400.0)
    assert(spark.sql(
      "SELECT size(hash_sample(h, CAST(id AS DOUBLE), 8)) FROM sql_hashed")
      .head().getInt(0) === 8)
    // below k distinct → exact
    assert(spark.sql("SELECT kmv_distinct(h, 16) FROM sql_hashed WHERE id < 5")
      .head().getDouble(0) === 5.0)
  }

  test("bloom_build / bloom_probe run the semi-join prefilter from plain SQL") {
    GraftFunctions.register(spark)
    spark.range(1000).selectExpr("id", "xxhash64(CAST(id AS STRING)) AS h")
      .createOrReplaceTempView("sql_bloom_all")
    // bench side = multiples of 100; the probe must pass all 10 of them and
    // (with 8M bits over 10 items) essentially nothing else
    val kept = spark.sql(
      """SELECT count(*) FROM sql_bloom_all
        |WHERE bloom_probe(
        |  (SELECT bloom_build(h, 1000000L, 8388608L) FROM sql_bloom_all
        |   WHERE id % 100 = 0),
        |  h)""".stripMargin).head().getLong(0)
    assert(kept >= 10 && kept <= 15,
      s"expected the 10 planted members plus at most a few FPs, got $kept")
    // 1-arg build form analyzes and runs too (conf-default sizing)
    assert(spark.sql(
      "SELECT bloom_build(h) IS NOT NULL FROM sql_bloom_all").head().getBoolean(0))
  }

  test("non-literal k is rejected loudly") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_distinct(id, CAST(id AS INT)) FROM range(3)").collect()
    }
    assert(e.getMessage.contains("INT literal"))
  }

  test("the SparkSessionExtensions hook injects all functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; same builders as above
  }
}
