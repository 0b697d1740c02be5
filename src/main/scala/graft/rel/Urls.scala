package graft.rel

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the ingest normalization every web corpus
  * runs before URL-keyed dedup and frontier scheduling (the scrape
  * stage of SURVEY §2.1 S1 sees the same page as `HTTP://Host/a?b#f`,
  * `http://host/a?b`, `http://host:80/a?b&utm_source=x`, …). One
  * canonical form per page collapses those into one fetch / one
  * dedup key.
  *
  * Rules (the industry-standard safe subset — each is a pure
  * string/array expression, codegen'd, no UDF):
  *   1. drop the fragment (`#…` never reaches the server);
  *   2. lowercase scheme and host (case-insensitive by RFC 3986);
  *   3. strip the scheme's default port (`:80` http, `:443` https);
  *   4. drop tracking params (`utm_*`, `fbclid`, `gclid`) and SORT
  *      the survivors (param order is almost never semantic; sorting
  *      makes the form canonical);
  *   5. drop a trailing `?` left by an emptied query and a trailing
  *      `/` on a non-root path.
  *
  * All five are expressible in any regex-capable engine — the DuckDB
  * oracle replays them with the same regex literals and list ops.
  */
object Urls {

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def hostPortOf(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  /** Everything after the authority, fragment already dropped. */
  private def restOf(noFrag: Column): Column =
    regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")

  /** The canonical form of `url` (null-safe: null stays null). A
    * scheme-less or relative input — anything the absolute-URL
    * grammar doesn't match — passes through UNCHANGED: the pre-r14
    * form assembled `'://' + input` out of the empty regex extracts,
    * a mangled key a frontier/serve consumer would emit as a garbage
    * URL. Tracking params are dropped whether or not they carry an
    * `=value` (a bare `fbclid` is still tracking noise). */
  def canonical(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = schemeOf(noFrag)
    val hostPort = hostPortOf(noFrag)
    val host = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rest = restOf(noFrag)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = when(rest.contains("?"),
      regexp_replace(rest, "^[^?]*\\?", "")).otherwise(lit(""))
    val keptParams = array_sort(filter(split(query, "&"),
      p => !(p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid)(=|$)") ||
        p === "")))
    val canonQuery = array_join(keptParams, "&")
    val canonPath = when(path.rlike("^/.+/$"),
      regexp_replace(path, "/$", "")).otherwise(path)
    when(scheme === "", url).otherwise(
      concat(scheme, lit("://"), host, canonPath,
        when(canonQuery =!= "", concat(lit("?"), canonQuery))
          .otherwise(lit(""))))
  }
}
