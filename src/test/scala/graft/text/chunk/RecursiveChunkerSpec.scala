package graft.text.chunk

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.text.Tok

/** Pure-Scala tests of the C2 core (no Spark needed — chunkDoc is the
  * flatMap kernel). Spark-side execution is covered by QueriesSpec. */
class RecursiveChunkerSpec extends AnyFunSuite {
  val ck = RecursiveChunker()

  test("empty and null docs yield nothing") {
    assert(ck.chunkDoc(1, "s", "").isEmpty)
    assert(ck.chunkDoc(1, "s", null).isEmpty)
  }

  test("short doc is a single chunk equal to the text") {
    val r = ck.chunkDoc(1, "s", "hello world.")
    assert(r.length == 1 && r.head.text == "hello world.")
    assert(r.head.start == 0 && r.head.end == 12)
  }

  test("chunk text always equals the doc substring at its offsets") {
    val text = ("spark row filter. merge table scan? " * 60) +
      "tail without separator end"
    ck.chunkDoc(7, "s", text).foreach { c =>
      assert(c.text == text.substring(c.start, c.end))
      assert(c.char_length == c.text.length)
      assert(c.token_length == Tok.count(c.text))
    }
  }

  test("every chunk respects the token budget when separators exist") {
    val text = "alpha beta gamma. " * 200
    val r = ck.chunkDoc(1, "s", text)
    assert(r.nonEmpty)
    r.foreach(c => assert(c.token_length <= ck.chunkSize,
      s"chunk ${c.chunk_index} has ${c.token_length} tokens"))
  }

  test("chunks are ordered, indexed densely, and make progress") {
    val text = "a b c d e f g h i j. " * 150
    val r = ck.chunkDoc(1, "s", text)
    assert(r.map(_.chunk_index) == r.indices.toVector)
    r.sliding(2).foreach {
      case Seq(a, b) => assert(b.start > a.start && b.end > a.end)
      case _ =>
    }
    // first chunk starts at 0, last ends at len
    assert(r.head.start == 0 && r.last.end == text.length)
  }

  test("consecutive chunks overlap by roughly the overlap budget") {
    val text = "one two three four five six seven eight nine ten. " * 100
    val r = ck.chunkDoc(1, "s", text)
    assert(r.length > 1)
    r.sliding(2).foreach {
      case Seq(a, b) =>
        val ov = a.end - b.start
        assert(ov >= 0, "chunks must not leave gaps beyond overlap re-seed")
        // overlap tokens bounded by the configured budget
        if (ov > 0) {
          val ovToks = Tok.count(text.substring(b.start, a.end))
          assert(ovToks <= ck.overlap)
        }
      case _ =>
    }
  }

  test("terminal fallback cuts on token boundaries (separator-free text)") {
    // > chunkSize tokens with NO listed separator (commas, no spaces)
    // → the recursion exhausts every separator and hits the terminal
    // fallback. Edges must snap to token starts so token_length
    // (countStarts in chunkDoc) equals a re-tokenization of the text.
    val text = (1 to 600).map(i => s"w$i").mkString(",")
    val r = ck.chunkDoc(1, "s", text)
    assert(r.length > 1, "fallback must still split an oversize region")
    r.foreach { c =>
      assert(c.text == text.substring(c.start, c.end))
      assert(c.token_length == Tok.count(c.text),
        s"chunk ${c.chunk_index}: countStarts ${c.token_length} != re-tokenized ${Tok.count(c.text)}")
      assert(c.token_length <= ck.chunkSize)
    }
    assert(r.head.start == 0 && r.last.end == text.length)
    r.sliding(2).foreach {
      case Seq(a, b) => assert(b.start == a.end, "fallback windows are contiguous")
      case _ =>
    }
  }

  test("SQL generator graft_chunk_recursive row-matches the DataFrame chunker") {
    val spark = graft.SparkTestBase.spark
    graft.GraftFunctions.register(spark)
    val docs = spark.read.parquet(graft.SparkTestBase.sf + "/documents.parquet")
      .limit(50)
    docs.createOrReplaceTempView("rc_docs")
    val sql = spark.sql(
      """SELECT doc_id, c.chunk_index, c.chunk_text AS text,
        |       c.start, c.end
        |FROM rc_docs LATERAL VIEW graft_chunk_recursive(text) c
        |""".stripMargin)
      .collect().map(_.toSeq).toSet
    val df = RecursiveChunker().chunk(docs)
      .select("doc_id", "chunk_index", "text", "start", "end")
      .collect().map(_.toSeq).toSet
    assert(sql == df, "SQL and DataFrame forms must be row-identical")
    assert(sql.nonEmpty)
    // explicit budgets route through the 3-arg form
    val small = spark.sql(
      """SELECT count(*) AS n
        |FROM rc_docs LATERAL VIEW graft_chunk_recursive(text, 20, 5) c
        |""".stripMargin).head().getLong(0)
    assert(small > sql.size, "smaller budget must yield more chunks")
    // malformed arity fails analysis cleanly, not at runtime
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT c.* FROM rc_docs LATERAL VIEW graft_chunk_recursive(text, 100) c")
        .collect()
    }
  }

  test("property: random word docs — budget + offset invariants hold") {
    val wordGen = Gen.oneOf("spark", "table", "scan", "merge", "row",
      "key", "agg", "window.", "batch?", "stream!")
    val docGen = Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))
    val prop = Prop.forAll(docGen) { text =>
      val r = ck.chunkDoc(1, "s", text)
      r.forall(c => c.text == text.substring(c.start, c.end)) &&
        r.forall(_.token_length <= ck.chunkSize) &&
        (text.isEmpty || (r.head.start == 0 && r.last.end == text.length))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }
}
