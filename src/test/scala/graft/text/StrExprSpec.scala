package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The scan-from-previous-match kernel must be VALUE-identical to the
  * all-positions HOF form it replaced in q_chunk_occurrences. */
class StrExprSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def hofPositions(doc: org.apache.spark.sql.Column,
      needle: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(length(doc) - length(needle) + 1 >= 1,
      filter(sequence(lit(1), length(doc) - length(needle) + 1),
        p => doc.substr(p, length(needle)) === needle))
      .otherwise(array().cast("array<int>"))

  test("indexesOf matches the HOF scan on crafted and adversarial strings") {
    val rows = Seq(
      ("abcabcabc", "abc"),        // repeats
      ("aaaaa", "aa"),             // OVERLAPPING matches: 1,2,3,4
      ("aaaaa", "aaaaa"),          // whole-string match
      ("aaaaa", "aaaaab"),         // needle longer than hay
      ("hello", "xyz"),            // no match
      ("", "a"),                   // empty hay
      ("αβγαβ", "αβ"),             // multibyte chars: positions 1, 4
      ("x\u0001y\u0001", "\u0001"), // the sentinel char the query injects
      ("docdoc", "docdocdoc"))
      .toDF("hay", "nee")
    val out = rows.select(
        StrExpr.indexesOf(col("hay"), col("nee")).as("fast"),
        hofPositions(col("hay"), col("nee")).as("slow"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"kernel ${r.getSeq[Int](0)} != HOF ${r.getSeq[Int](1)}")
    }
  }

  test("empty needle is defined as no matches (never occurs in the query)") {
    val got = Seq(("abc", "")).toDF("hay", "nee")
      .select(StrExpr.indexesOf(col("hay"), col("nee"))).head().getSeq[Int](0)
    assert(got.isEmpty)
  }

  test("indexesOf agrees with the HOF scan on pseudo-random strings") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { _ =>
      val hay = (1 to rnd.nextInt(40)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val nee = (1 to 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      (hay, nee)
    }.toDF("hay", "nee")
    val bad = rows.select(
        StrExpr.indexesOf(col("hay"), col("nee")).as("fast"),
        hofPositions(col("hay"), col("nee")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(bad.count() == 0)
  }

  test("registered SQL surface graft_indexes_of works") {
    graft.GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_indexes_of('aaaa', 'aa') AS p")
      .head().getSeq[Int](0)
    assert(got == Seq(1, 2, 3))
  }
}
