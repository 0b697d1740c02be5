package graft.textan

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the ingest stage between the reference's
  * Selenium scrape (SURVEY §2.1 S1; `/root/reference/Data_Collection/
  * web_scraper.py` hands raw page sources to the pipeline) and every
  * downstream text operator: strip markup, drop script/style/comment
  * payloads, decode the common entities, collapse whitespace. A web
  * corpus at 100 TB is HTML before it is text, and this is the one
  * pass that turns it into the `documents.text` the rest of the
  * engine consumes.
  *
  * Spark-first shape: a pure `regexp_replace`/`replace` chain —
  * codegen'd, zero shuffle, rides the scan like [[Scrub.redact]].
  * Every pattern is RE2-safe with INLINE flags (`(?is)`), so the
  * DuckDB oracle runs the byte-identical patterns with only the 'g'
  * flag added. Fidelity bar: tag-soup HTML (unclosed tags, attribute
  * noise) degrades to extra whitespace, never to an error — the
  * corpus-scale failure mode is a skipped document, not a crashed
  * stage.
  *
  * Order is part of the spec:
  *  1. comments, then script, then style blocks are DELETED whole
  *     (their body text is not content);
  *  2. block-level tags become a space (so `<p>a</p><p>b</p>` keeps
  *     a word boundary), remaining tags likewise;
  *  3. entities decode AFTER tag stripping (`&lt;b&gt;` must surface
  *     as the literal text `<b>`, not get re-stripped), `&amp;` LAST
  *     (else `&amp;lt;` would double-decode);
  *  4. whitespace collapses to single spaces, trimmed.
  */
object Html {
  val CommentRe = "(?s)<!--.*?-->"
  val ScriptRe = "(?is)<script\\b[^>]*>.*?</script>"
  val StyleRe = "(?is)<style\\b[^>]*>.*?</style>"
  val TagRe = "<[^>]*>"
  // explicit whitespace class ([[graft.text.Tok.Ws]]): Java `\s`
  // includes VT, RE2's does not — spelled out so both engines agree
  val WsRe = s"[${graft.text.Tok.Ws}]+"
  val TitleRe = "(?is)<title[^>]*>(.*?)</title>"
  val HrefRe = "(?i)\\bhref=\""

  /** The literal entity decode table, in application order. */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }

  /** Visible text of an HTML page: strip → decode → collapse. */
  def extractText(html: Column): Column = {
    val stripped = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, CommentRe, ""),
          ScriptRe, ""),
        StyleRe, ""),
      TagRe, " ")
    trim(regexp_replace(decodeEntities(stripped), WsRe, " "))
  }

  /** First `<title>` body (entity-decoded, whitespace-collapsed);
    * empty string when the page has none. */
  def extractTitle(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_extract(html, TitleRe, 1)), WsRe, " "))

  /** Outbound-link count: `href="` attribute occurrences — the
    * crawl-frontier signal a link graph builds from. */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit(HrefRe), lit(0))).cast("int")
}
