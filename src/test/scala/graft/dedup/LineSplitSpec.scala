package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the giant-document split branch of [[Dedup.linesOf]] /
  * [[Dedup.lineDedup]] to the per-row path BIT FOR BIT (the
  * gopher-gate split discipline): token-snapped pieces with a base
  * line offset must reproduce the exact (doc_id, p, line) rows,
  * including the empty-token edge cases single-space splitting
  * creates (doubled spaces, trailing spaces, empty and null text). */
class LineSplitSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def crafted = {
    val rnd = new scala.util.Random(14L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "y2")
    Seq(
      // exact multiple of a line
      (1L, Seq.tabulate(20)(i => s"a$i").mkString(" ")),
      // partial trailing line
      (2L, Seq.tabulate(23)(i => s"b$i").mkString(" ")),
      // doubled + trailing spaces → empty tokens count as tokens
      (3L, "c0  c1 c2   c3 "),
      // empty text → one empty-line row
      (4L, ""),
      // null text → same single empty-line row (null-routing rule)
      (5L, null.asInstanceOf[String]),
      // long doc spanning many pieces at the test's tiny stride
      (6L, (1 to 997).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")),
      // space-free blob longer than a piece → stays one piece
      (7L, "z" * 400))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
    df.select("doc_id", "p", "line").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  test("linesOf: split path == per-row path bit for bit") {
    val docs = crafted
    val whole = rows(Dedup.linesOf(docs, splitChars = Long.MaxValue))
    for (lpp <- Seq(1, 3, 7)) { // 10, 30, 70 tokens per piece
      val split = rows(Dedup.linesOf(docs.withColumn("n_chars", lit(1000L)),
        splitChars = 10L, linesPerPiece = lpp))
      assert(split == whole, s"diverged at linesPerPiece=$lpp")
    }
    // null/empty text emits exactly one empty-line row (ADVICE r13:
    // split(null) used to drop the document from the report)
    assert(whole.filter(_._1 == 4L) == Set((4L, 0, "")))
    assert(whole.filter(_._1 == 5L) == Set((5L, 0, "")))
    // frames without n_chars keep the plain per-row path
    assert(rows(Dedup.linesOf(docs.drop("n_chars"))) == whole)
  }

  test("lineDedup report is identical through the split branch") {
    val docs = crafted
    def report(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(4))).toSeq
    val whole = report(Dedup.lineDedup(docs, splitChars = Long.MaxValue))
    val split = report(Dedup.lineDedup(
      docs.withColumn("n_chars", lit(1000L)),
      splitChars = 10L, linesPerPiece = 2))
    assert(split == whole)
    // every doc (incl. null-text doc 5) has a row in the report
    assert(whole.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("linePieces: whole-line pieces, concat-identity, space-free blobs") {
    // 25 tokens, lineTokens=10, linesPerPiece=1 → cuts after tokens
    // 10 and 20; pieces carry 10/10/5 tokens
    val text = (0 until 25).map(i => s"t$i").mkString(" ")
    val ps = Dedup.linePieces(text, 10, 1)
    assert(ps.map(_.base).toSeq == Seq(0, 1, 2))
    assert(ps.map(_.piece.split(" ", -1).length).toSeq == Seq(10, 10, 5))
    // removing one delimiter space per cut: concat with " " restores
    assert(ps.map(_.piece).mkString(" ") == text)
    // a space-free run stays ONE piece regardless of length
    assert(Dedup.linePieces("q" * 100, 2, 1).length == 1)
    // trailing space → trailing empty token lands in the last piece
    val ps2 = Dedup.linePieces("a b ", 1, 1)
    assert(ps2.map(p => (p.base, p.piece)).toSeq ==
      Seq((0, "a"), (1, "b"), (2, "")))
  }
}
