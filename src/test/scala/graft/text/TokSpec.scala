package graft.text

import org.scalatest.funsuite.AnyFunSuite

class TokSpec extends AnyFunSuite {
  test("alnum runs are one token, symbols one each") {
    assert(Tok.tokenize("hello world") == Vector("hello", "world"))
    assert(Tok.tokenize("a-b c.d") == Vector("a", "-", "b", "c", ".", "d"))
    assert(Tok.tokenize("abc123 x9") == Vector("abc123", "x9"))
  }
  test("empty and whitespace-only texts have zero tokens") {
    assert(Tok.count("") == 0)
    assert(Tok.count("   \n\t ") == 0)
  }
  test("count agrees with tokenize") {
    val s = "the fast key order sort, table scan! merge 42 part."
    assert(Tok.count(s) == Tok.tokenize(s).length)
  }
  test("countRegion equals count of the substring for every region") {
    // includes mid-token cuts — the opaque region must behave exactly
    // like the substring even when an edge splits an alnum run
    val texts = Seq("", "a", "hello world", "a-b c.d 42x\n\npara two!",
      "  spaces   and\ttabs ", "纯中文 tokens mixed 12ab")
    for (s <- texts; a <- 0 to s.length; b <- a to s.length)
      assert(Tok.countRegion(s, a, b) == Tok.count(s.substring(a, b)),
        s"region ($a,$b) of '$s'")
  }
}
