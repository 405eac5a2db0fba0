package graft

import graft.operators.Pii
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "reach me at jane.doe+x@corp.example.org or 1-555-0100"),
      (2L, "server at 192.168.0.12 logged id 123456789012"),
      (3L, "nothing sensitive here at all"),
      (4L, "double email a@b.co c@d.io and ip 10.0.0.1")
    ).toDF("doc_id", "text")
  }

  test("per-category counts and has_pii") {
    val st = Pii.withPiiStats(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(st(1L).getAs[Int]("n_email") == 1)
    assert(st(1L).getAs[Int]("n_phone") == 1)
    assert(st(2L).getAs[Int]("n_ipv4") == 1)
    assert(st(2L).getAs[Int]("n_long_id") == 1)
    assert(!st(3L).getAs[Boolean]("has_pii"))
    assert(st(4L).getAs[Int]("n_email") == 2)
  }

  test("redaction chain replaces every category, in order") {
    val red = Pii.withRedacted(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("redacted")).toMap
    assert(red(1L) == "reach me at <EMAIL> or <PHONE>")
    assert(red(2L) == "server at <IP> logged id <ID>")
    assert(red(3L) == "nothing sensitive here at all")
    assert(red(4L) == "double email <EMAIL> <EMAIL> and ip <IP>")
  }

  test("cleanDocs keeps only PII-free rows with original schema") {
    val clean = Pii.cleanDocs(docs)
    assert(clean.columns.toSeq == Seq("doc_id", "text"))
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }
}
