package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the filter/scrub stage every
  * training-data pipeline runs before text leaves the corpus (emails,
  * phone-shaped numbers, IPv4 addresses, long numeric identifiers).
  *
  * Scale shape: pure codegen column expressions (`regexp_extract_all` /
  * `regexp_replace`) — one scan, zero shuffles, pipelines into whatever
  * filter/write follows. The patterns deliberately use no lookaround or
  * backreferences, so the SAME strings compile under Spark's Java engine
  * and RE2-family engines (the [[graft.functions.TextOps]] discipline) and
  * a DuckDB/Trino oracle can replay them verbatim.
  */
object Pii {

  val Email  = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4   = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val Phone  = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?"
  val LongId = "[0-9]{9,}"

  /** (name, pattern, replacement token) in REDACTION ORDER: emails first
    * (their local parts contain digit runs), addresses before bare digit
    * runs, the catch-all long-id last so it only sees what the specific
    * categories left behind. */
  val Categories: Seq[(String, String, String)] = Seq(
    ("email", Email, "<EMAIL>"),
    ("ipv4", Ipv4, "<IP>"),
    ("phone", Phone, "<PHONE>"),
    ("long_id", LongId, "<ID>"))

  /** Match count of one pattern (group 0) in a string column. */
  def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Per-category match counts `n_<category>` plus a `has_pii` flag. */
  def withPiiStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val base = Categories.foldLeft(df) { case (f, (name, pat, _)) =>
      f.withColumn(s"n_$name", countMatches(col(textCol), pat))
    }
    base.withColumn("has_pii",
      Categories.map(c => col(s"n_${c._1}") > 0).reduce(_ || _))
  }

  /** The redaction chain over one string column, category order as above. */
  def redact(c: Column): Column =
    Categories.foldLeft(c) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  def withRedacted(df: DataFrame, textCol: String = "text",
                   outCol: String = "redacted"): DataFrame =
    df.withColumn(outCol, redact(col(textCol)))

  /** The keep-side of a PII gate: documents with no detected PII at all
    * (pipelines route the rest through [[withRedacted]] or drop them). */
  def cleanDocs(df: DataFrame, textCol: String = "text"): DataFrame =
    withPiiStats(df, textCol).filter(!col("has_pii"))
      .drop(("has_pii" +: Categories.map(c => s"n_${c._1}")): _*)
}
