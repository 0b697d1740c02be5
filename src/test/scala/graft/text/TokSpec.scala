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
}
