package graft.textan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII-style text scrubbing for training-data preparation (north-star
  * extension, BASELINE.json): emails, URLs, then long digit runs are
  * replaced with typed placeholders. Pure `regexp_replace` chain —
  * codegen'd, zero shuffle, and oracle-portable (the same RE2-safe
  * patterns run in DuckDB with the 'g' flag).
  *
  * Replacement order matters and is part of the spec: emails first
  * (their local part may contain digit runs), then URLs (paths often
  * embed ids), then any remaining run of ≥4 digits.
  */
object Scrub {
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val NumRe = "[0-9]{4,}"

  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      NumRe, "<NUM>")

  def withRedacted(df: DataFrame, textCol: String = "text",
      out: String = "redacted"): DataFrame =
    df.withColumn(out, redact(col(textCol)))
}
