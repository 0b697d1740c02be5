package graft.textan

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("detectLang: stopword-dominant language wins; CJK → zh; none → und") {
    val got = Seq(
      "the cat and the dog is in a tree",
      "le chat est dans la maison et le jardin",
      "el perro es un animal que vive por la casa",
      "der hund ist ein tier und die katze",
      "你好世界 早上好",
      "xyzzy plugh")
      .toDF("text")
      .select(TextAnalysis.detectLang(col("text")).as("l"))
      .as[String].collect().toSeq
    assert(got == Seq("en", "fr", "es", "de", "zh", "und"))
  }

  test("quality score is in [0,1]; longer prose scores higher than noise") {
    val got = Seq(
      "the data is in the table and it is good for the query plan of the engine",
      "@@@ ### $$$ %%% ^^^ &&&",
      "")
      .toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
      .as[Double].collect().toSeq
    got.foreach(q => assert(q >= 0.0 && q <= 1.0))
    assert(got(0) > got(1))
  }

  test("withQuality equals the per-Column forms bit-for-bit") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val staged = TextAnalysis.withQuality(docs)
      .select("doc_id", "n_tokens", "punct_ratio", "digit_ratio",
        "stopword_ratio", "avg_token_chars", "quality")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val perColumn = TextAnalysis.qualityColumns(col("text"))
      .foldLeft(docs) { case (df, (n, c)) => df.withColumn(n, c) }
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .select("doc_id", "n_tokens", "punct_ratio", "digit_ratio",
        "stopword_ratio", "avg_token_chars", "quality")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(staged == perColumn)
  }

  test("winnow fingerprint: deterministic, shift-invariant core") {
    val a = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog")
    val b = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog")
    assert(a == b && a.nonEmpty)
    assert(TextAnalysis.winnow("short") == Seq.empty) // < k chars
    // shared k-grams survive as shared fingerprints
    val c = TextAnalysis.winnow("XX the quick brown fox jumps over the lazy dog")
    assert(a.toSet.intersect(c.toSet).nonEmpty)
  }

  test("contentFingerprint normalizes whitespace and case") {
    val got = Seq("A  B\tC", "a b c", " a b c ").toDF("text")
      .select(TextAnalysis.contentFingerprint(col("text")).as("f"))
      .as[String].collect().toSeq
    assert(got.distinct.length == 1)
  }
}
