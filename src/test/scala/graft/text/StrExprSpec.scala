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

  // ===== longestAffixOverlap — must be VALUE-identical to the O(L²)
  // HOF form it replaced in q_text_overlap_pairs =====

  private def hofOverlap(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // the `when` guard matters: Spark sequence(1, 0) DESCENDS ([1,0]),
    // and l=1 on two empty strings compares "" === "" — the unguarded
    // form "finds" overlap 1 where DuckDB's generate_series finds none
    def oneWay(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      coalesce(array_max(filter(
        when(least(length(x), length(y)) >= 1,
          sequence(lit(1), least(length(x), length(y))))
          .otherwise(array().cast("array<int>")),
        l => x.substr(length(x) - l + 1, l) === y.substr(lit(1), l))), lit(0))
    greatest(oneWay(a, b), oneWay(b, a))
  }

  test("longestAffixOverlap matches the HOF form on crafted and adversarial strings") {
    val rows = Seq(
      ("abcdef", "defxyz"),      // plain 3-char suffix/prefix overlap
      ("aaaa", "aaa"),           // all-same: min length wins (3)
      ("ababab", "bababa"),      // periodic both directions (5)
      ("abc", "abc"),            // identical: whole string (3)
      ("abc", "xyz"),            // nothing
      ("", "abc"),               // empty side
      ("", ""),                  // both empty
      ("xy", "yxyxyx"),          // overlap via the REVERSE direction
      ("aabaa", "aab"),          // full b inside a, and prefix overlap
      ("αβγ", "βγα"),            // multibyte: suffix βγ? no — γ vs β; reverse: α (1)
      ("x" * 500 + "ov", "ov" + "y" * 500), // long strings, small overlap
      ("docdoc", "docdocdoc"))   // needle longer than hay
      .toDF("a", "b")
    val bad = rows.select(
        StrExpr.longestAffixOverlap(col("a"), col("b")).as("fast"),
        hofOverlap(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(bad.count() == 0)
  }

  test("longestAffixOverlap agrees with the HOF form on pseudo-random strings") {
    // alphabet of 2 forces dense periodic collisions — the KMP
    // fallback chain is exercised hard
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      val a = (1 to rnd.nextInt(30)).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
      val b = (1 to rnd.nextInt(30)).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
      (a, b)
    }.toDF("a", "b")
    val bad = rows.select(
        StrExpr.longestAffixOverlap(col("a"), col("b")).as("fast"),
        hofOverlap(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(bad.count() == 0)
  }

  test("repetitionCounts matches an independent in-memory reference") {
    // reference: group the space-joined n-grams of the token list and
    // read total/distinct/singleton/max counts off the grouping — the
    // definition the kernel's hash map must reproduce exactly.
    def ref(toks: Seq[String], n: Int): (Long, Long, Long, Long) = {
      val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      val byGram = grams.groupBy(identity).view.mapValues(_.size).toMap
      (grams.size.toLong, byGram.size.toLong,
        byGram.count(_._2 == 1).toLong,
        if (byGram.isEmpty) 0L else byGram.values.max.toLong)
    }
    val fixtures: Seq[Seq[String]] = Seq(
      Seq.empty,                                  // no tokens
      Seq("a"),                                   // below every n>1
      Seq("a", "a", "a", "a"),                    // one gram repeated
      Seq("a", "b", "a", "b", "a"),               // periodic
      Seq("x", "y", "z"),                         // all distinct
      Seq("α", "β", "α", "𝔘", "𝔘"),               // multibyte + astral
      (1 to 200).map(i => s"w${i % 7}"))          // long periodic tail
    val rnd = new scala.util.Random(13)
    val rows = fixtures ++ (1 to 100).map(_ =>
      (1 to rnd.nextInt(30)).map(_ => s"t${rnd.nextInt(5)}"))
    val got = rows.toDF("ts")
      .select(StrExpr.repetitionCounts(col("ts")).as("rc"))
      .collect()
    rows.zip(got).foreach { case (toks, r) =>
      val rc = r.getStruct(0)
      (1 to 4).foreach { n =>
        val (t, d, s, m) = ref(toks, n)
        val j = (n - 1) * 4
        assert((rc.getLong(j), rc.getLong(j + 1), rc.getLong(j + 2),
            rc.getLong(j + 3)) == ((t, d, s, m)),
          s"n=$n toks=$toks got ${(rc.getLong(j), rc.getLong(j + 1),
            rc.getLong(j + 2), rc.getLong(j + 3))} want ${(t, d, s, m)}")
      }
    }
  }

  test("registered SQL surface graft_affix_overlap works; bad arity errors cleanly") {
    graft.GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_affix_overlap('abcdef', 'defxyz') AS o")
      .head().getInt(0)
    assert(got == 3)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_affix_overlap('abc') AS o").collect()
    }
    assert(e.getMessage.contains("Invalid number of arguments"))
  }
}
