package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.functions._

/** KMV distinct-count sketch ([[graft.functions.KmvDistinct]]): exactness
  * below k, the (k−1)/u_k estimator above k, merge/partition invariance
  * (the 100 TB contract — partial aggregation must not change the result),
  * and null handling. */
class SketchSpec extends SparkSpec {

  private def hashed(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("id").select(KmvSketch.hash60(col("id")).as("h"))
  }

  test("kmv is exact below k distinct values") {
    val df = hashed(Seq(1L, 2L, 3L, 2L, 1L, 3L, 4L))
    val est = df.agg(KmvSketch.kmvDistinct(col("h"), 16)).head().getDouble(0)
    assert(est === 4.0)
  }

  test("kmv above k matches the (k-1)/u_k formula on the true k-th hash") {
    val ids = (1L to 200L)
    val df = hashed(ids)
    val k = 16
    val est = df.agg(KmvSketch.kmvDistinct(col("h"), k)).head().getDouble(0)
    val hs = df.collect().map(_.getLong(0)).distinct.sorted
    val expected = (k - 1).toDouble / (hs(k - 1).toDouble / 1152921504606846976.0)
    assert(math.abs(est - expected) < 1e-9)
    // sanity: the estimate is in the right ballpark of the true 200
    assert(est > 100.0 && est < 400.0)
  }

  test("kmv is partition-invariant (merge path == single partition)") {
    val df = hashed((1L to 500L) ++ (1L to 100L))
    val one = df.coalesce(1).agg(KmvSketch.kmvDistinct(col("h"), 16)).head().getDouble(0)
    val many = df.repartition(7).agg(KmvSketch.kmvDistinct(col("h"), 16)).head().getDouble(0)
    assert(one === many)
  }

  test("kmv grouped: per-group buffers stay independent and nulls are skipped") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None), ("b", Some(9L)))
      .toDF("g", "id")
      .select(col("g"), when(col("id").isNotNull, KmvSketch.hash60(col("id"))).as("h"))
    val out = df.groupBy("g").agg(KmvSketch.kmvDistinct(col("h"), 16).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") === 2.0 && out("b") === 1.0)
  }

  test("hash_sample keeps exactly the k smallest-hash payloads, hash-ordered") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i * 1.5)).toDF("id", "v")
      .select(KmvSketch.hash60(col("id")).as("h"), col("v"))
    val sample = df.agg(KmvSketch.hashSample(col("h"), col("v"), 10))
      .head().getSeq[Double](0)
    // replay: sort ids by their hash, take 10, map to payloads
    val expected = (1L to 100L)
      .map(i => (i, i * 1.5))
      .map { case (i, v) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(hex.take(15), 16), v)
      }.sortBy(_._1).take(10).map(_._2)
    assert(sample === expected)
  }

  test("hash_sample is partition-invariant and under-full groups emit all rows") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i % 3, i, i * 0.25)).toDF("g", "id", "v")
      .select(col("g"), KmvSketch.hash60(col("id")).as("h"), col("v"))
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(KmvSketch.hashSample(col("h"), col("v"), 16).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(run(df.coalesce(1)) === run(df.repartition(13)))
    val small = (1L to 5L).map(i => (i, i * 1.0)).toDF("id", "v")
      .select(KmvSketch.hash60(col("id")).as("h"), col("v"))
    assert(small.agg(KmvSketch.hashSample(col("h"), col("v"), 16))
      .head().getSeq[Double](0).size === 5)
  }

  test("empty and all-null inputs produce the identity results, not errors") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("id")
      .select(KmvSketch.hash60(col("id")).as("h"))
    assert(empty.agg(KmvSketch.kmvDistinct(col("h"), 16)).head().getDouble(0) === 0.0)
    assert(empty.agg(KmvSketch.hashSample(col("h"),
      col("h").cast("double"), 4)).head().getSeq[Double](0).isEmpty)
    val nulls = Seq(Some(1L), None, None).toDF("id")
      .select(when(col("id").isNotNull, KmvSketch.hash60(col("id"))).as("h"))
    assert(nulls.agg(KmvSketch.kmvDistinct(col("h"), 16)).head().getDouble(0) === 1.0)
  }

  test("∀ generated inputs: hash_sample and kmv match brute-force replay") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def md560(i: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val gen = for {
      n    <- Gen.choose(1, 120)
      k    <- Gen.choose(2, 32)
      dups <- Gen.choose(0, 3)
      lo   <- Gen.choose(0L, 100000L)
    } yield (((lo until lo + n) ++ (lo until lo + math.min(n, dups))).toSeq, k)
    (1 to 8).foreach { i =>
      val (ids, k) = gen(Gen.Parameters.default, Seed(i.toLong)).get
      val df = ids.map(x => (x, x * 0.5)).toDF("id", "v")
        .repartition(3)
        .select(KmvSketch.hash60(col("id")).as("h"), col("v"))
      val r = df.agg(KmvSketch.kmvDistinct(col("h"), k),
        KmvSketch.hashSample(col("h"), col("v"), k)).head()
      val hs = ids.distinct.map(x => (md560(x), x * 0.5)).sortBy(_._1)
      val expEst =
        if (hs.length < k) hs.length.toDouble
        else (k - 1).toDouble / (hs(k - 1)._1.toDouble / 1152921504606846976.0)
      assert(math.abs(r.getDouble(0) - expEst) < 1e-9, s"kmv case $i")
      assert(r.getSeq[Double](1) === hs.take(k).map(_._2), s"sample case $i")
    }
  }

  test("hash60 stays inside the 60-bit domain") {
    val mx = hashed((1L to 1000L)).agg(max(col("h")), min(col("h"))).head()
    assert(mx.getLong(0) < 1152921504606846976L && mx.getLong(1) >= 0L)
  }
}
