package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null-document routing through the giant-split discipline
  * ([[graft.text.chunk.DocSplit.subThreshold]]): a document with NULL
  * text has NULL `n_chars`, which satisfies neither `n_chars <= k`
  * nor `n_chars > k` — before the fix, a corpus containing one giant
  * (activating the two-branch plan) silently DROPPED every null-text
  * row from the output of all four routed kernels. The contract this
  * spec pins: routed output == pure per-row output on every row,
  * null-text rows included, and a null-text row scores exactly like
  * an empty-text row. */
class NullRoutingSpec extends AnyFunSuite with SparkTestBase {

  /** Small + NULL-text + empty-text + giant rows: the giant forces
    * the two-branch plan, the null row is the one at risk, and the
    * empty row is the value twin the null row must match. */
  private def corpus: DataFrame = {
    import spark.implicits._
    val giant = Seq.tabulate(60)(i => s"w$i tok gram").mkString(" ")
    Seq(
      (1L, Option("alpha beta alpha beta gamma alpha")),
      (2L, Option.empty[String]),
      (3L, Option("")),
      (4L, Option(giant))
    ).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** splitChars small enough that only the giant row crosses it. */
  private val Split = 100L

  private def rowsOf(df: DataFrame): Seq[Row] =
    df.orderBy("doc_id").collect().toSeq

  test("repetitionSignals keeps and empty-scores a null-text row") {
    val routed = rowsOf(Queries.repetitionSignals(corpus, splitChars = Split,
      pieceChars = 16))
    val perRow = rowsOf(Queries.repetitionSignals(corpus,
      splitChars = Long.MaxValue))
    assert(routed.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L))
    assert(routed == perRow)
    val (nul, empty) = (routed(1), routed(2))
    assert(nul.toSeq.tail == empty.toSeq.tail) // same signals, ids differ
  }

  test("bpeTokenSignals keeps and empty-scores a null-text row") {
    val routed = rowsOf(Queries.bpeTokenSignals(corpus, splitChars = Split))
    val perRow = rowsOf(Queries.bpeTokenSignals(corpus,
      splitChars = Long.MaxValue))
    assert(routed.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L))
    assert(routed == perRow)
    val (nul, empty) = (routed(1), routed(2))
    assert(nul.toSeq.tail == empty.toSeq.tail)
    assert(nul.getAs[Int]("n_bpe_tokens") == 0)
    assert(nul.getAs[Int]("n_regex_tokens") == 0)
  }

  test("classifierScore keeps and empty-scores a null-text row") {
    val routed = rowsOf(graft.textan.TextAnalysis.classifierScore(corpus,
      splitChars = Split, partTokens = 16))
    val perRow = rowsOf(graft.textan.TextAnalysis.classifierScore(corpus,
      splitChars = Long.MaxValue))
    assert(routed.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L))
    assert(routed == perRow)
    val nul = routed(1)
    assert(nul.getAs[Int]("n_features") == 0)
    assert(nul.getAs[Double]("score") == 0.0)
    assert(nul.getAs[Int]("keep") == 1) // 0 >= 0 at threshold 0, not NULL
  }

  test("withSimhash keeps a null-text row with the empty-text simhash") {
    val routed = rowsOf(graft.dedup.Dedup.withSimhash(corpus,
      splitChars = Split, partTokens = 16).select("doc_id", "simhash"))
    val perRow = rowsOf(graft.dedup.Dedup.withSimhash(
        corpus.drop("n_chars")) // no n_chars column → always per-row
      .select("doc_id", "simhash"))
    assert(routed.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L))
    assert(routed == perRow)
    assert(routed(1).get(1) == routed(2).get(1)) // null == empty simhash
  }
}
