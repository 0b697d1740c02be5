package graft.text

import org.scalatest.funsuite.AnyFunSuite

class BpeLiteSpec extends AnyFunSuite {

  test("golden: exact merge sequence + encodings on the classic low/lower/lowest vocab") {
    // hand-derived: (l,o) and (o,w) tie at 10 → lexicographic (l,o);
    // then (lo,w)=10, (low,e)=5; (lowe,s) and (s,t) tie at 3 →
    // "lowe" < "s"; then (lowes,t)=3, finally (lowe,r)=2
    val vocab = Map("low" -> 5L, "lower" -> 2L, "lowest" -> 3L)
    val merges = BpeLite.train(vocab, 6)
    assert(merges == Vector(
      "l" -> "o", "lo" -> "w", "low" -> "e",
      "lowe" -> "s", "lowes" -> "t", "lowe" -> "r"))
    assert(BpeLite.encodeWord("low", merges) == Vector("low"))
    assert(BpeLite.encodeWord("lower", merges) == Vector("lower"))
    assert(BpeLite.encodeWord("lowest", merges) == Vector("lowest"))
    // out-of-vocab word reuses learned subwords: s + lower
    assert(BpeLite.encodeWord("slower", merges) == Vector("s", "lower"))
    // vocabulary exhausts after 6 merges — extra budget changes nothing
    assert(BpeLite.train(vocab, 100) == merges)
  }

  test("training merges the most frequent pair first, ties lexicographic") {
    val merges = BpeLite.train(Map("aaab" -> 10L, "aab" -> 5L), 1)
    assert(merges == Vector(("a", "a"))) // "aa" dominates
  }

  test("encoding is deterministic and concatenates back to the word") {
    val merges = BpeLite.train(
      Map("sparkly" -> 5L, "spark" -> 20L, "sparse" -> 8L), 6)
    val toks = BpeLite.encodeWord("sparkling", merges)
    assert(toks.mkString == "sparkling")
    assert(toks == BpeLite.encodeWord("sparkling", merges))
  }

  test("merges reduce token counts on in-domain text") {
    val corpus = Map("table" -> 50L, "stable" -> 30L, "tablet" -> 20L)
    val merges = BpeLite.train(corpus, 8)
    val before = "table".length
    val after = BpeLite.encodeWord("table", merges).length
    assert(after < before)
  }

  test("whitespace text splits per word; empty/null safe") {
    val merges = BpeLite.train(Map("ab" -> 2L), 1)
    assert(BpeLite.encode("ab ab", merges) == Vector("ab", "ab"))
    assert(BpeLite.encode("", merges).isEmpty)
    assert(BpeLite.encode(null, merges).isEmpty)
  }

  test("train is insensitive to map iteration order (determinism)") {
    val c1 = Map("hello" -> 3L, "help" -> 3L, "held" -> 3L)
    val c2 = scala.collection.immutable.ListMap(c1.toSeq.reverse: _*).toMap
    assert(BpeLite.train(c1, 5) == BpeLite.train(c2, 5))
  }

  test("trainDistributed == driver train on the full vocabulary (real corpus)") {
    val spark = graft.SparkTestBase.spark
    val docs = spark.read.parquet(graft.SparkTestBase.sf + "/documents.parquet")
    val distributed = BpeLite.trainDistributed(docs, numMerges = 8)
    val driver = BpeLite.train(
      BpeLite.wordCounts(docs, topN = 1 << 20), numMerges = 8)
    assert(distributed == driver)
    assert(distributed.length == 8)
  }

  test("trainDistributed == driver train on non-BMP text (code-point symbols, UTF-8 ties)") {
    // supplementary-plane stress: emoji words shear into surrogate
    // halves under a UTF-16 split, and Java String order disagrees
    // with UTF-8 byte order between U+E000..U+FFFF and U+10000+ —
    // both trainers must split by code point and tie-break in UTF-8
    // byte order to produce one merge sequence
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val e = "😀" // U+1F600 emoji (supplementary plane)
    val g = "𝄞" // U+1D11E musical clef (supplementary plane)
    val f = "ﬀ"       // U+FB00 ff-ligature (BMP, sorts ABOVE the
                           // supplementary chars in UTF-16 units but
                           // BELOW them in UTF-8 bytes / code points)
    val docs = Seq(
      s"$e${e}a a$e $f$e",
      s"$e${e}a ${f}z ${g}z z${e}a",
      s"$e$e $g$f z${e}a").toDF("text")
    val d = BpeLite.trainDistributed(docs, numMerges = 6)
    val t = BpeLite.train(BpeLite.wordCounts(docs), numMerges = 6)
    assert(d == t)
    // symbols are whole code points: encoding an emoji word yields
    // concatenable, well-formed tokens (no lone surrogates — a lone
    // surrogate would not survive a UTF-8 round-trip)
    val toks = BpeLite.encodeWord(s"${e}z$e", d)
    assert(toks.mkString == s"${e}z$e")
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    assert(toks.forall(s => new String(s.getBytes(utf8), utf8) == s))
  }

  test("trainDistributed folds pending merges without changing the sequence") {
    // foldEvery=1 (fold after every round) and foldEvery=100 (never
    // fold) must produce the exact same merges as the driver trainer
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val docs = Seq("low low lower", "low lowest wide wider").toDF("text")
    val t = BpeLite.train(BpeLite.wordCounts(docs), numMerges = 7)
    assert(BpeLite.trainDistributed(docs, numMerges = 7, foldEvery = 1) == t)
    assert(BpeLite.trainDistributed(docs, numMerges = 7, foldEvery = 100) == t)
  }

  test("trainDistributed stops early when the vocabulary exhausts, matching train") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val docs = Seq("low low lower", "low lowest").toDF("text")
    val d = BpeLite.trainDistributed(docs, numMerges = 100)
    val t = BpeLite.train(BpeLite.wordCounts(docs), numMerges = 100)
    assert(d == t)
    assert(d.nonEmpty && d.length < 100) // merged to whole words, stopped
  }

  test("training plan never materializes the vocabulary on the driver (no LocalRelation)") {
    val spark = graft.SparkTestBase.spark
    val docs = spark.read.parquet(graft.SparkTestBase.sf + "/documents.parquet")
    val words = BpeLite.wordFrame(docs, "text")
    // round 3's argmax frame: vocabulary flows parquet scan → agg →
    // re-merge UDF → pair explode → agg → single-row limit; a driver
    // round-trip would surface as a LocalRelation/LocalTableScan leaf
    val round = BpeLite.pairArgmax(words, Vector("t" -> "h", "e" -> "r"))
    val leaves = round.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty)
    leaves.foreach { leaf =>
      assert(!leaf.getClass.getSimpleName.contains("LocalRelation"),
        s"vocabulary-sized local leaf in training plan: $leaf")
    }
    // and the argmax really is a single row
    assert(round.count() == 1)
  }

  test("wordCounts refuses an unbounded driver collect") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val docs = Seq("a b").toDF("text")
    intercept[IllegalArgumentException] {
      BpeLite.wordCounts(docs, topN = Int.MaxValue)
    }
  }
}
