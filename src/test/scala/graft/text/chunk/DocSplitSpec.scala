package graft.text.chunk

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The giant-document split policy: kernel cut semantics (snap
  * priority, lookback bound, hard-cut fallback, exact coverage) and
  * the split-then-chunk composition (identity below the threshold,
  * valid re-based offsets above it — the properties that let
  * q_chunk_recursive_split share q_chunk_recursive's oracle while
  * splitting a 50 MB row-skew document ~50 ways). */
class DocSplitSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("short doc is one part; empty/null yield nothing") {
    assert(DocSplit.cutOffsets("hello world", 100).toSeq == Seq((0, 11)))
    assert(DocSplit.cutOffsets("", 100).isEmpty)
  }

  test("parts cover the document exactly and respect maxChars") {
    val texts = Seq(
      "spark row filter merge table scan value " * 40,
      ("no separators" + "x" * 500) + " tail",
      "a. b. c. " * 100,
      "word " * 3 + "x" * 300 + " " + "y" * 300) // long runs force hard cuts
    for (t <- texts; max <- Seq(37, 120, 1000)) {
      val offs = DocSplit.cutOffsets(t, max)
      assert(offs.head._1 == 0 && offs.last._2 == t.length)
      offs.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 == s2)
        case _ =>
      }
      offs.foreach { case (s, e) =>
        assert(e > s && e - s <= max, s"part ($s,$e) breaks max=$max")
      }
      assert(offs.map { case (s, e) => t.substring(s, e) }.mkString == t)
    }
  }

  test("random texts: coverage, bounds and snap-validity hold (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.chooseNum(1, 9).flatMap(n => Gen.stringOfN(n, Gen.alphaChar))
    val sep = Gen.oneOf(" ", ". ", "? ", "! ", "\n", "\n\n", "")
    val textGen = for {
      n <- Gen.chooseNum(0, 120)
      ws <- Gen.listOfN(n, Gen.zip(word, sep))
    } yield ws.map { case (w, s) => w + s }.mkString
    val prop = Prop.forAll(textGen, Gen.chooseNum(5, 90),
        Gen.chooseNum(0, 50)) { (t: String, max: Int, lb: Int) =>
      val offs = DocSplit.cutOffsets(t, max, lb)
      val covers = t.isEmpty && offs.isEmpty ||
        (offs.head._1 == 0 && offs.last._2 == t.length &&
          offs.sliding(2).forall {
            case Array((_, e1), (s2, _)) => e1 == s2
            case _ => true
          })
      val bounded = offs.forall { case (s, e) => e > s && e - s <= max }
      val rebuilt =
        offs.map { case (s, e) => t.substring(s, e) }.mkString == t
      covers && bounded && rebuilt
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("cut snaps to the LAST occurrence of the highest-priority separator") {
    // window [hard-lookback, hard) = [10, 20): '.' at 12 and 16, ' ' at 18
    // — priority picks '.', last occurrence wins (cut after index 16)
    val t = "aaaaaaaaaaaa.aaa.a a" + "b" * 30
    val offs = DocSplit.cutOffsets(t, maxChars = 20, lookback = 10)
    assert(offs.head == ((0, 17)), s"got ${offs.head}")
    // same text, lookback too short to reach any separator: hard cut
    val hard = DocSplit.cutOffsets("c" * 19 + "." + "c" * 30, 25, 4)
    assert(hard.head == ((0, 25)))
  }

  test("multi-char separator must sit fully inside the snap window") {
    // "\n\n" straddles the window edge (first \n at hard-lookback-1):
    // only the second \n is inside, so "\n\n" cannot match, and the
    // single "\n" (next priority) snaps at its last in-window index
    val t = "x" * 9 + "\n\n" + "x" * 20
    val offs = DocSplit.cutOffsets(t, maxChars = 15, lookback = 5)
    assert(offs.head == ((0, 11)), s"got ${offs.head}") // after the 2nd \n
  }

  test("parts() rows agree with the kernel and carry exact offsets") {
    val docs = Seq(
      (1L, "s", "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "s", "tiny"),
      (3L, "s", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val got = DocSplit.parts(docs, maxChars = 12, lookback = 8)
      .orderBy("doc_id", "part_index").collect()
    val expect1 = DocSplit.cutOffsets(
      "alpha beta gamma delta epsilon zeta eta theta", 12, 8)
    val rows1 = got.filter(_.getLong(0) == 1L)
    assert(rows1.length == expect1.length)
    rows1.zip(expect1).foreach { case (r, (s, e)) =>
      assert(r.getInt(3) == s && r.getInt(4) == e)
      assert(r.getString(5) ==
        "alpha beta gamma delta epsilon zeta eta theta".substring(s, e))
    }
    assert(got.count(_.getLong(0) == 2L) == 1) // single part, text intact
    assert(!got.exists(_.getLong(0) == 3L))    // null doc vanishes
  }

  test("non-BMP text: hard cuts never split a surrogate pair, parts rebuild") {
    val emoji = "😀" // one code point, two UTF-16 units
    val texts = Seq(
      emoji * 100,                        // pure astral, no separators
      ("ab " + emoji) * 50,               // separators between pairs
      "x" * 7 + emoji + "y" * 30)         // pair straddling a hard bound
    for (t <- texts; max <- Seq(5, 8, 21)) {
      val offs = DocSplit.cutOffsets(t, max)
      assert(offs.map { case (s, e) => t.substring(s, e) }.mkString == t)
      offs.foreach { case (s, e) =>
        val part = t.substring(s, e)
        assert(!Character.isLowSurrogate(part.charAt(0)),
          s"part [$s,$e) starts mid-pair")
        assert(!Character.isHighSurrogate(part.charAt(part.length - 1)),
          s"part [$s,$e) ends mid-pair")
      }
    }
  }

  test("chunkParts honors the Chunker input contract (FixedChunker needs n_chars)") {
    val text = "alpha beta gamma delta epsilon zeta " * 30 // ~1 kB
    val docs = Seq((21L, "f", text), (22L, "f", "short one"))
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val ck = FixedChunker(size = 100, overlap = 10)
    val whole = ck.chunk(docs).orderBy("doc_id", "chunk_index").collect()
    // identity below the threshold
    val same = DocSplit.chunkParts(docs, ck, maxChars = 1 << 20)
      .orderBy("doc_id", "chunk_index").collect()
    assert(whole.length == same.length)
    whole.zip(same).foreach { case (w, s) => assert(w == s) }
    // above the threshold: valid re-based fixed chunks, full coverage
    val split = DocSplit.chunkParts(docs, ck, maxChars = 300)
      .filter(col("doc_id") === 21L).orderBy("chunk_index").collect()
    assert(split.length > 1)
    split.foreach { c =>
      assert(c.getString(3) == text.substring(c.getInt(4), c.getInt(5)))
    }
    assert(split.head.getInt(4) == 0 && split.last.getInt(5) == text.length)
  }

  test("chunkParts == chunk when every doc fits one part") {
    val docs = Seq(
      (10L, "a", "spark row filter. merge table scan? " * 8),
      (11L, "b", "short doc"),
      (12L, "c", "alpha beta gamma. delta epsilon! zeta " * 5))
      .toDF("doc_id", "source", "text")
    val ck = RecursiveChunker(chunkSize = 20, overlap = 5)
    val whole = ck.chunk(docs).orderBy("doc_id", "chunk_index").collect()
    val split = DocSplit.chunkParts(docs, ck, maxChars = 1 << 20)
      .orderBy("doc_id", "chunk_index").collect()
    assert(whole.length == split.length)
    whole.zip(split).foreach { case (w, s) => assert(w == s) }
  }

  test("chunkParts above the threshold: valid re-based chunks, no part-spanning") {
    val text = "spark value merge filter table window batch. " * 200 // ~9 kB
    val docs = Seq((5L, "g", text)).toDF("doc_id", "source", "text")
    val maxChars = 1000
    val partEnds = DocSplit.cutOffsets(text, maxChars).map(_._2).toSet
    val chunks = DocSplit.chunkParts(docs, RecursiveChunker(), maxChars)
      .orderBy("chunk_index").collect()
    assert(chunks.length > 1)
    chunks.zipWithIndex.foreach { case (c, i) =>
      assert(c.getInt(2) == i) // contiguous renumbered chunk_index
      val (s, e) = (c.getInt(4), c.getInt(5))
      assert(c.getString(3) == text.substring(s, e)) // re-based offsets
      // a chunk never spans a part boundary (boundaries are forced)
      assert(!partEnds.exists(b => s < b && b < e),
        s"chunk [$s,$e) spans a part cut")
    }
    // chunks cover the document: every part boundary is some chunk edge
    val starts = chunks.map(_.getInt(4)).toSet
    assert(partEnds.filter(_ < text.length).forall(starts.contains),
      "each interior part cut starts a chunk")
  }

  test("chunkParts: out-of-range doc_id on the big branch fails fast") {
    val giant = "alpha beta gamma. " * 60 // > maxChars below
    // wide (>= 2^31) and negative ids would silently alias documents
    // through the 31-bit part-id packing — the guard must raise
    for (bad <- Seq(1L << 31, (1L << 40) + 7L, -1L)) {
      val docs = Seq((bad, "g", giant)).toDF("doc_id", "source", "text")
      // collect, not count: count() prunes every column, including
      // the guarded doc_id — any consumer that reads rows evaluates it
      val e = intercept[Exception] {
        DocSplit.chunkParts(docs, RecursiveChunker(), maxChars = 300).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("doc_id out of [0, 2^31)")),
        s"no guard error for doc_id=$bad")
    }
    // wide ids BELOW the threshold never touch the packing: fine
    val small = Seq(((1L << 40) + 7L, "g", "short doc"))
      .toDF("doc_id", "source", "text")
    val out = DocSplit.chunkParts(small, RecursiveChunker(), maxChars = 300)
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == (1L << 40) + 7L)
  }

  test("chunkParts: a chunker violating the dense chunk_index contract fails fast") {
    // base+local renumbering is only sound for dense 0..n-1 per part;
    // a 1-based chunker must hit the density assert, not silently
    // emit gapped global indexes (r15 ADVICE guard)
    val oneBased = new Chunker {
      def strategy = "one-based"
      def chunk(docs: org.apache.spark.sql.DataFrame) =
        RecursiveChunker().chunk(docs)
          .withColumn("chunk_index", col("chunk_index") + 1)
    }
    val giant = "alpha beta gamma delta. " * 40
    val docs = Seq((1L, "g", giant)).toDF("doc_id", "source", "text")
    val e = intercept[Exception] {
      DocSplit.chunkParts(docs, oneBased, maxChars = 300).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dense chunk_index")),
      s"expected the density assert, got: ${msgs(e)}")
    // the same violating chunker on the SMALL branch is untouched —
    // renumbering (and its assert) exists only for split giants
    val small = Seq((2L, "g", "short doc")).toDF("doc_id", "source", "text")
    assert(DocSplit.chunkParts(small, oneBased, maxChars = 300)
      .collect().length >= 1)
  }

  test("cutOffsets rejects maxChars < 2 (astral invariant unsatisfiable)") {
    intercept[IllegalArgumentException] { DocSplit.cutOffsets("abc", 1) }
    intercept[IllegalArgumentException] { DocSplit.cutOffsets("abc", 0) }
    // 2 is the smallest total bound: a surrogate pair fits one part
    val t = "a😀b😁" // a😀b😁
    val offs = DocSplit.cutOffsets(t, 2)
    assert(offs.map { case (s, e) => t.substring(s, e) }.mkString == t)
    offs.foreach { case (s, e) => assert(e - s <= 2) }
  }
}
