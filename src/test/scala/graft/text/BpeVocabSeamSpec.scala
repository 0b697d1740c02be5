package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The real-vocabulary tokenizer seam (the r12 `BatchModel` proof's
  * mirror, VERDICT r13 #7): an EXTERNAL merge table in the standard
  * `merges.txt` format loads through [[BpeLite.parseMerges]] and
  * drives the very same machinery the trained path uses — encode,
  * the count Column, and the giant-doc exploded counter — with
  * bit-identical results. GPT-2/tiktoken-style vocabularies are
  * exactly this file shape, so swapping in a real tokenizer is a
  * parse call, not a code path. */
class BpeVocabSeamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // a hand-written external vocabulary, merges.txt format (with the
  // header comment real files carry); ranks are line order
  private val mergesTxt = Seq(
    "#version: 0.2",
    "",
    "l o",
    "lo w",
    "e r",
    "er s",
    "low ers")
  private val external = BpeLite.parseMerges(mergesTxt)

  test("parseMerges: format, rank order, malformed rejection") {
    assert(external == Vector("l" -> "o", "lo" -> "w", "e" -> "r",
      "er" -> "s", "low" -> "ers"))
    assertThrows[IllegalArgumentException](
      BpeLite.parseMerges(Seq("a b c")))
    assertThrows[IllegalArgumentException](BpeLite.parseMerges(Seq("solo")))
  }

  test("external merges drive encode exactly like any trained table") {
    // hand-derived segmentations under the rank order above
    assert(BpeLite.encodeWord("lowers", external) == Vector("lowers"))
    assert(BpeLite.encodeWord("lower", external) == Vector("low", "er"))
    assert(BpeLite.encodeWord("lows", external) == Vector("low", "s"))
    assert(BpeLite.encodeWord("ever", external) == Vector("e", "v", "er"))
    assert(BpeLite.encode("lowers lower  lows", external) ==
      Vector("lowers", "low", "er", "low", "s"))
  }

  test("a trained table reproducing the external ranks encodes identically") {
    // corpus crafted so train() learns the external list verbatim:
    // 'low' lifts (l,o)/(lo,w) above the e/r pairs at ranks 1-2, then
    // every rank-3..5 argmax falls to the UTF-8 tie-break — (e,r)
    // beats (low,e), (er,s) beats (low,er) — exactly the published
    // vocabulary's order
    val corpus = Map(
      "lowers" -> 10L,
      "low" -> 5L)
    val trained = BpeLite.train(corpus, external.length)
    assert(trained == external,
      s"crafted corpus must reproduce the external vocabulary: $trained")
    val words = Seq("lowers", "lower", "lows", "slower", "zz")
    words.foreach { w =>
      assert(BpeLite.encodeWord(w, trained) == BpeLite.encodeWord(w, external))
    }
  }

  test("count Column and exploded giant path run unchanged on the external vocab") {
    val docs = Seq(
      (1L, "lowers lower lows"),
      (2L, "ever lowers  er"),
      (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // per-row UDF column under the external merges
    val perRow = docs
      .withColumn("n", when(col("text").isNull, lit(0))
        .otherwise(BpeLite.tokenCountCol(external)))
      .select("doc_id", "n").as[(Long, Int)].collect().toMap
    // doc 1: lowers(1) + lower(low,er) + lows(low,s) = 5
    // doc 2: ever(e,v,er) + lowers(1) + er(er) = 5
    assert(perRow == Map(1L -> 5, 2L -> 5, 3L -> 0, 4L -> 0))
    // the giant-doc exploded counter: same numbers, same machinery
    val exploded = BpeLite.tokenCountsExploded(docs, external)
      .as[(Long, Int)].collect().toMap
    assert(exploded == Map(1L -> 5, 2L -> 5)) // token-less docs join-side
  }
}
