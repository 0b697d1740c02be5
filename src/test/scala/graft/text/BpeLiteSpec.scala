package graft.text

import org.scalatest.funsuite.AnyFunSuite

class BpeLiteSpec extends AnyFunSuite {

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
}
