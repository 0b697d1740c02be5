package graft.textan

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins [[Html.pageReport]]'s giant-page split to the per-row chain
  * BIT FOR BIT (title, link count, extracted-text length and md5) on
  * adversarial tag soup: `>` in text and comments, entities at and
  * around cut candidates, protected blocks sitting INSIDE tags and
  * entities (the removal-assembly cases the span-end protection
  * exists for), whitespace runs straddling cuts, unclosed blocks. */
class HtmlSplitSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val pages = Seq(
    // plain page: tags, entities, comment, script, style, title, links
    (1L, "<html><!-- note --><head><title>T &amp; U</title>" +
      "<style>b{x:1}</style><script>if(1&lt;2){}</script></head>" +
      "<body><p>alpha beta</p><a href=\"http://e/1\">x</a>" +
      "<a href=\"http://e/2\">y</a></body></html>"),
    // raw '>' in text content; '>' inside a comment body
    (2L, "<p>a > b</p><!-- x > y --><p>c</p><p>" +
      ("w1 w2 w3 " * 40) + "</p>"),
    // comment INSIDE a tag → the tag re-assembles after removal; a
    // cut at the comment's final '>' would bisect it (span-end rule)
    (3L, "<p <!-- gap --> >seam one</p>" + ("t " * 60) +
      "<p <!-- another --> >seam two</p>"),
    // comment INSIDE an entity → '&amp;' assembles after removal
    (4L, "x &am<!-- hole -->p; y " + ("u v " * 50) + "z &g<!-- h -->t; w"),
    // title with entities + internal whitespace run; second title
    // later (FIRST must win)
    (5L, ("lead " * 30) + "<title>A  &quot;B&quot;\nC</title>" +
      ("mid " * 30) + "<title>not this</title>" + ("tail " * 30)),
    // unclosed script (no match → tag stripped, body kept), then a
    // closed one; style with '>' inside its body
    (6L, "<script>orphan body " + ("s " * 40) +
      "<script>closed</script><style>a>b{c:d}</style><p>end</p>"),
    // whitespace run straddling every likely cut: tabs/newlines
    (7L, ("<b>seg</b> \t\n " * 60)),
    // entity split candidates: '>' immediately before entities
    (8L, ("<i>k</i>&amp;&lt;&gt;" * 50)),
    // no eligible '>' at all in a long span (one serial piece)
    (9L, "<p>" + ("q" * 300) + " tail</p>"),
    // empty + null pages
    (10L, ""),
    (11L, null.asInstanceOf[String]),
    // comment-ASSEMBLED closers (r15): the raw pattern finds no match
    // for these openers, so the unclosed-opener guard must protect
    // opener→end and keep each region one piece — per-row assembles
    // `</script>`/`</style>` after comment removal and deletes the
    // bodies; an unguarded cut inside them would keep deleted text
    (12L, ("lead " * 40) + "<script>assembled body " + ("x " * 50) +
      "</scr<!-- gap -->ipt><p>kept after</p>"),
    (13L, ("pre " * 30) + "<style>h1{a:b} " + ("y " * 40) +
      "</sty<!-- hole -->le><p>visible tail</p>" + ("post " * 30)))
    .toDF("doc_id", "html")

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2), r.get(3),
        r.getString(4))).toSeq

  test("pageReport: split path == per-row chain bit for bit") {
    val whole = report(Html.pageReport(pages, splitChars = Long.MaxValue))
    for (pieceChars <- Seq(17, 64, 256)) {
      val split = report(Html.pageReport(pages,
        splitChars = 5L, pieceChars = pieceChars))
      assert(split == whole, s"diverged at pieceChars=$pieceChars")
    }
  }

  test("pageCutOffsets: exact cover, tag/entity/protected-span safety") {
    val html = pages.filter($"doc_id" =!= 11L).select("html")
      .as[String].collect().mkString("<hr/>")
    for (maxChars <- Seq(13, 50, 200)) {
      val cuts = Html.pageCutOffsets(html, maxChars)
      // exact cover: concat(parts) == html
      assert(cuts.map { case (s, e) => html.substring(s, e) }
        .mkString == html)
      // every interior cut lands right after a '>' or a whitespace
      // char (the text-content cut class)
      cuts.drop(1).foreach { case (s, _) =>
        val p = html.charAt(s - 1)
        assert(p == '>' || " \t\n\f\r".contains(p),
          s"cut at $s after '$p'")
      }
      // and never strictly inside a tag span of the COMMENT-REMOVED
      // text (an independent re-derivation of the assembled-tag rule:
      // strip protected blocks the way the pipeline does, find TagRe
      // matches, map their offsets back through the removals)
      val protSpans = {
        val b = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        for (re <- Seq(Html.CommentRe, Html.ScriptRe, Html.StyleRe,
            Html.TitleRe)) {
          val m = java.util.regex.Pattern.compile(re).matcher(html)
          while (m.find()) b += ((m.start(), m.end()))
        }
        b.sortBy(_._1).toList
      }
      def inProt(i: Int) = protSpans.exists { case (s, e) => s <= i && i < e }
      // positions of the stripped text → original offsets
      val keptIdx = (0 until html.length).filterNot(inProt).toArray
      val strippedTxt = keptIdx.map(html.charAt).mkString
      val m = java.util.regex.Pattern.compile(Html.TagRe).matcher(strippedTxt)
      while (m.find()) {
        val os = keptIdx(m.start()); val oe = keptIdx(m.end() - 1) + 1
        cuts.drop(1).foreach { case (c, _) =>
          assert(c <= os || c >= oe,
            s"cut $c bisects assembled tag [$os,$oe)")
        }
      }
      // no cut bisects a protected match span (inclusive of its end)
      for (re <- Seq(Html.CommentRe, Html.ScriptRe, Html.StyleRe,
          Html.TitleRe)) {
        val m = java.util.regex.Pattern.compile(re).matcher(html)
        while (m.find()) cuts.drop(1).foreach { case (c, _) =>
          assert(c <= m.start() || c > m.end(),
            s"cut $c inside protected [${m.start()},${m.end()}] of $re")
        }
      }
    }
  }

  test("pageCutOffsets: unclosed/assembled-closer opener protected to end") {
    // assembled closer: no raw ScriptRe match, guard must keep the
    // opener's tail in ONE piece (no interior cuts past the opener)
    val html = ("a " * 30) + "<script>body " + ("w " * 30) +
      "</scr<!-- gap -->ipt><p>kept</p>"
    val open = html.indexOf("<script")
    for (maxChars <- Seq(11, 40, 100)) {
      val cuts = Html.pageCutOffsets(html, maxChars)
      assert(cuts.map { case (s, e) => html.substring(s, e) }
        .mkString == html)
      cuts.drop(1).foreach { case (c, _) =>
        assert(c <= open, s"cut $c inside the unclosed opener's tail")
      }
    }
  }

  test("q_html_extract output schema/order unchanged through the routing") {
    val out = graft.Queries.q_html_extract(spark, sf)
    assert(out.columns.toSeq ==
      Seq("doc_id", "title", "n_links", "n_chars", "text_md5"))
    assert(out.count() > 0)
  }
}
