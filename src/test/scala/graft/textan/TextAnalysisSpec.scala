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

  test("classifierScore matches an independent driver-side replay") {
    val texts = Seq("The quick brown fox!", "a", "", "Hello hello HELLO world",
      "x y z x_y", "punct... only?!")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .transform(TextAnalysis.classifierScore(_))
      .select("doc_id", "n_features", "s_int", "score", "keep")
      .as[(Long, Int, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap

    def weight(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("clf|" + f).getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
    }
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]".r
        .findAllIn(t.toLowerCase).toVector
      val feats = toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"${a}_$b" }
      val sInt = feats.map(weight).sum
      val (_, n, s, score, keep) = got(i.toLong)
      assert(n == feats.length, s"n_features for '$t'")
      assert(s == sInt, s"s_int for '$t'")
      val want = if (feats.isEmpty) 0.0
        else BigDecimal(sInt.toDouble / (1000.0 * feats.length))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(score - want) < 1e-9, s"score for '$t'")
      assert(keep == (if (sInt >= 0) 1 else 0))
    }
  }

  test("classifierScore split path == per-row path bit-identically") {
    val rnd = new scala.util.Random(13)
    val words = Vector("alpha", "beta", "gamma", "delta", "the", "of", "x9")
    def doc(n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    // threshold 100 chars, 7-token parts: docs 2 and 4 split (several
    // parts incl. a ragged tail); 0/1/3 stay per-row; 5 is empty
    val rows = Seq(
      (0L, doc(3)), (1L, doc(12)), (2L, doc(120)),
      (3L, ""), (4L, doc(260)), (5L, doc(1)))
      .map { case (id, t) => (id, t, t.length.toLong) }
    val df = rows.toDF("doc_id", "text", "n_chars")
    val split = TextAnalysis
      .classifierScore(df, splitChars = 100L, partTokens = 7)
      .select("doc_id", "n_features", "s_int", "score", "keep")
      .as[(Long, Int, Long, Double, Int)].collect().sortBy(_._1).toSeq
    val perRow = TextAnalysis
      .classifierScore(df, splitChars = Long.MaxValue)
      .select("doc_id", "n_features", "s_int", "score", "keep")
      .as[(Long, Int, Long, Double, Int)].collect().sortBy(_._1).toSeq
    assert(split == perRow)
    // the split really engaged: doc 4 spans multiple parts
    assert(rows(4)._2.length > 100)
  }

  test("classifierScore split == per-row over randomized docs and strides") {
    val rnd = new scala.util.Random(29)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "the", "x", "42", "...")
    for (round <- 0 until 8) {
      val stride = 2 + rnd.nextInt(9) // 2..10 tokens per part
      val docs = (0 until 12).map { i =>
        val n = rnd.nextInt(40) // 0..39 tokens, many multi-part at small strides
        val t = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
        (i.toLong, t, t.length.toLong)
      }
      val df = docs.toDF("doc_id", "text", "n_chars")
      val split = TextAnalysis
        .classifierScore(df, splitChars = 10L, partTokens = stride)
        .select("doc_id", "n_features", "s_int")
        .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
      val perRow = TextAnalysis
        .classifierScore(df, splitChars = Long.MaxValue)
        .select("doc_id", "n_features", "s_int")
        .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
      assert(split == perRow, s"divergence at round $round stride $stride")
    }
  }

  test("gopherRules: line-exploded giant branch == per-row, bit-identically") {
    // adversarial shapes at line granularity: bullet lines, ellipsis
    // line-ends, long dot runs (non-overlapping count), empty lines
    // (split -1 trailing empties), '#' density, a no-newline giant
    // (degenerates to ONE exploded line — still exact), empty and
    // null text
    val docs = Seq(
      (1L, "- bullet one\n* bullet two\n• third\nplain line"),
      (2L, "ends with dots...\nand unicode…\nno dots"),
      (3L, "......\n.....\n....\n..."), // runs of 6/5/4/3 dots
      (4L, "## hash # line\n\n\ntrailing empties\n\n"),
      (5L, ("the be to of and that have with " * 30).trim), // stop hits
      (6L, "oneline without any newline " * 20),
      (7L, ""),
      (8L, null.asInstanceOf[String]),
      (9L, "\n\n\n")) // giant of only empty lines: zero piece rows
      .toDF("doc_id", "text")
      .withColumn("n_chars",
        when(col("text").isNull, lit(null).cast("long"))
          .otherwise(length(col("text")).cast("long")))
    val cols = Seq("doc_id", "n_words", "mean_word_len", "symbol_ratio",
      "bullet_frac", "ellipsis_frac", "alpha_frac", "n_stop_hits", "pass")
    // splitChars = 1: every non-null doc takes the giant branch
    val split = TextAnalysis.gopherRules(docs, splitChars = 1L)
      .select(cols.map(col): _*).orderBy(col("doc_id")).collect()
    val whole = TextAnalysis.gopherRules(docs, splitChars = Long.MaxValue)
      .select(cols.map(col): _*).orderBy(col("doc_id")).collect()
    assert(split.length == whole.length)
    split.zip(whole).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // the fixture corpus end-to-end (real texts, both routes)
    val fx = spark.read.parquet(s"$sf/documents.parquet")
    val fxSplit = TextAnalysis.gopherRules(fx, splitChars = 100L)
      .select(cols.map(col): _*).orderBy(col("doc_id")).collect()
    val fxWhole = TextAnalysis.gopherRules(fx, splitChars = Long.MaxValue)
      .select(cols.map(col): _*).orderBy(col("doc_id")).collect()
    fxSplit.zip(fxWhole).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("gopherRules: multi-piece line sub-split == per-row, incl. space-free blobs") {
    // pieceChars = 7 forces MANY pieces per line; shapes chosen so a
    // wrong cut would visibly change a counter: long words around the
    // stride boundary, a dot run longer than the stride, tab-separated
    // tokens (tab is a snap point), and a space-FREE blob longer than
    // the stride (must stay ONE piece — a hard cut would split the
    // word and the dot run)
    val docs = Seq(
      (1L, "the quick brown foxes jumped over lazy dogs repeatedly"),
      (2L, "supercalifragilistic expialidocious " * 4),
      (3L, ".............." + " " + "word" + " " + ".........."),
      (4L, "aaaa\tbbbb\tcccc\tdddd\teeee\tffff"),
      (5L, "zqx9" * 12), // 48-char space-free blob: one piece
      (6L, ("#" * 30) + " the end..."),
      (7L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val cols = Seq("doc_id", "n_words", "mean_word_len", "symbol_ratio",
      "bullet_frac", "ellipsis_frac", "alpha_frac", "n_stop_hits", "pass")
    val split = TextAnalysis
      .gopherRules(docs, splitChars = 1L, pieceChars = 7)
      .select(cols.map(col): _*).orderBy(col("doc_id")).collect()
    val whole = TextAnalysis.gopherRules(docs, splitChars = Long.MaxValue)
      .select(cols.map(col): _*).orderBy(col("doc_id")).collect()
    split.zip(whole).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("gopherRules: crafted docs hit each rule") {
    import org.apache.spark.sql.functions.col
    val good = ("the cat sat with the dog and that was fine " * 5).trim
    val bullets = "- one\n- two\n- three\n- four"
    val ells = "first line...\nsecond line...\nthird"
    val symbols = "the " + ("### " * 20) + ("word " * 20)
    val empty = ""
    val rows = Seq((0L, good), (1L, bullets), (2L, ells), (3L, symbols),
      (4L, empty)).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(rows)
      .select("doc_id", "n_words", "bullet_frac", "ellipsis_frac",
        "symbol_ratio", "n_stop_hits", "pass")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getInt(1) === 50)          // 10 words x 5
    assert(got(0L).getInt(6) === 1)           // the one passing doc
    assert(got(1L).getDouble(2) === 1.0)      // all lines bulleted
    assert(got(1L).getInt(6) === 0)
    assert(got(2L).getDouble(3) > 0.3)        // 2/3 ellipsis lines
    assert(got(3L).getDouble(4) > 0.1)        // symbol-heavy
    assert(got(3L).getInt(6) === 0)
    assert(got(4L).getInt(1) === 0)           // empty: no crash
    assert(got(4L).getInt(6) === 0)
  }
}
