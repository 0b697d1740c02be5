package graft.textan

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Html]] extraction semantics on crafted pages: payload blocks
  * deleted whole, tag soup degrading to whitespace (never an error),
  * the entity decode order (no double decode), and the title/link
  * surfaces. The corpus-wide hash check is q_html_extract. */
class HtmlSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def extract(html: String): (String, String, Int) = {
    val r = Seq(html).toDF("html")
      .select(Html.extractText(col("html")).as("t"),
        Html.extractTitle(col("html")).as("ti"),
        Html.linkCount(col("html")).as("n"))
      .head()
    (r.getString(0), r.getString(1), r.getInt(2))
  }

  test("script/style/comment bodies are deleted, not surfaced") {
    val (t, _, _) = extract(
      "<body><script>var hidden = 1;</script><style>p{x}</style>" +
        "<!-- secret -->visible</body>")
    assert(t === "visible")
  }

  test("multiline script block with attributes is deleted") {
    val (t, _, _) = extract(
      "<SCRIPT type=\"text/javascript\">\nline1();\nline2();\n</SCRIPT>ok")
    assert(t === "ok")
  }

  test("tags become word boundaries") {
    val (t, _, _) = extract("<p>alpha</p><p>beta</p>")
    assert(t === "alpha beta")
  }

  test("entities decode once, amp last — &amp;lt; stays literal &lt;") {
    val (t, _, _) = extract("<p>a &lt; b &amp;lt; c &quot;q&quot; &#39;s&#39; x&nbsp;y</p>")
    assert(t === "a < b &lt; c \"q\" 's' x y")
  }

  test("tag soup degrades to whitespace, never an error") {
    val (t, _, _) = extract("<p><b>un<closed text > tail < 3")
    // "<closed text >" parses as one tag; the dangling "< 3" is kept
    assert(t === "un tail < 3")
  }

  test("title extracted and decoded; empty when absent") {
    val (_, ti, _) = extract("<head><title> A &amp; B </title></head>x")
    assert(ti === "A & B")
    val (_, none, _) = extract("<p>no head</p>")
    assert(none === "")
  }

  test("link count counts href attributes case-insensitively") {
    val (_, _, n) = extract(
      "<a href=\"u1\">x</a><A HREF=\"u2\">y</A><a name=\"z\">no</a>")
    assert(n === 2)
  }
}
