package graft.text.chunk

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class FixedChunkerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docsOf(texts: (Long, String)*) =
    texts.toSeq.toDF("doc_id", "text")
      .withColumn("source", concat(lit("src"), col("doc_id")))
      .withColumn("n_chars", length(col("text")).cast("long"))

  private def rows(texts: (Long, String)*) =
    FixedChunker().chunk(docsOf(texts: _*))
      .orderBy("doc_id", "chunk_index")
      .select("doc_id", "chunk_index", "text", "start", "end")
      .collect()

  test("empty document yields no chunks (while start < len)") {
    assert(rows(1L -> "").isEmpty)
  }

  test("short document yields exactly one full-text chunk") {
    val r = rows(1L -> "abc")
    assert(r.length == 1)
    assert(r(0).getString(2) == "abc")
    assert(r(0).getInt(3) == 0 && r(0).getInt(4) == 3)
  }

  test("doc of exactly 400 chars yields a second short tail chunk") {
    // reference semantics: while start < len ⇒ start=350 < 400 emits
    // the 50-char tail (chromadb_rag.py:55-59)
    val r = rows(1L -> ("a" * 400))
    assert(r.map(_.getString(2)) sameElements Array("a" * 400, "a" * 50))
  }

  test("stride is 350 and chunks are ≤400 chars; offsets match text") {
    // property sweep over lengths incl. the boundary cases 349..401
    val lengths = Seq(1, 5, 349, 350, 351, 399, 400, 401, 749, 750, 751, 1234, 2000)
    val docs = lengths.zipWithIndex.map { case (n, i) =>
      (i.toLong, ("abcdefghij" * 200).take(n))
    }
    val byDoc = rows(docs: _*).groupBy(_.getLong(0))
    docs.foreach { case (id, text) =>
      val r = byDoc(id).sortBy(_.getInt(1))
      val starts = r.map(_.getInt(3))
      assert(starts.zipWithIndex.forall { case (st, i) => st == 350 * i })
      r.foreach { row =>
        val (chunk, st, en) = (row.getString(2), row.getInt(3), row.getInt(4))
        assert(chunk.length <= 400)
        assert(chunk == text.substring(st, en))
      }
      assert(r.last.getInt(4) == text.length) // full coverage
      // expected chunk count: ceil(len / 350) with while-start<len rule
      assert(r.length == (text.length + 349) / 350)
    }
  }

  test("unicode (BMP) text chunks by character, offsets consistent") {
    // é (1 char), CJK (1 char each) — Spark substr counts code
    // points, matching the reference's Python slicing
    val text = ("héllo wörld 汉字测试 " * 40).trim
    val r = rows(1L -> text)
    r.foreach { row =>
      assert(row.getString(2) == text.substring(row.getInt(3), row.getInt(4)))
    }
    assert(r.last.getInt(4) == text.length)
  }

  test("dropping the 50-char overlap reconstructs the document") {
    val text = "the quick brown fox jumps over the lazy dog " * 40
    val r = rows(1L -> text)
    val rebuilt = r.zipWithIndex.map { case (row, i) =>
      val c = row.getString(2)
      if (i == 0) c else c.drop(50)
    }.mkString
    assert(rebuilt == text)
  }
}
