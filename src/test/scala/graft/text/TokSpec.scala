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
  test("wsPieces: exact cover, snap validity, and per-piece sums (property)") {
    // wsPieces is load-bearing for q_bpe_tokens/q_bpe_real_vocab
    // giant parity: per-piece token counts and word multisets must
    // SUM/UNION to the per-row result exactly, for arbitrary text and
    // stride
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', ' ', '\t', '\n', '', '\f', '\r'),
      1 -> Gen.oneOf('-', '.', ',', '!', '€', '中'))
    val textGen = Gen.listOf(charGen).map(_.mkString)
    val prop = Prop.forAll(textGen, Gen.choose(1, 40)) { (s, stride) =>
      val ps = Tok.wsPieces(s, stride)
      val cover = ps.mkString == s || (s.isEmpty && ps.toSeq == Seq(""))
      // every interior cut lands after a whitespace char
      val snaps = {
        var off = 0
        ps.dropRight(1).forall { p =>
          off += p.length
          off == 0 || " \t\n\f\r".contains(s.charAt(off - 1))
        }
      }
      val tokSum = ps.map(Tok.count).sum == Tok.count(s)
      val wordCat = ps.flatMap(_.split(s"[${Tok.Ws}]+")).filter(_.nonEmpty)
        .toSeq == s.split(s"[${Tok.Ws}]+").filter(_.nonEmpty).toSeq
      cover && snaps && tokSum && wordCat
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("wsPieces: null/empty yield one empty piece; ws-free runs stay whole") {
    assert(Tok.wsPieces(null, 8).toSeq == Seq(""))
    assert(Tok.wsPieces("", 8).toSeq == Seq(""))
    val blob = "x" * 100 // no whitespace anywhere: one serial piece
    assert(Tok.wsPieces(blob, 8).toSeq == Seq(blob))
    val two = ("y" * 30) + " " + ("z" * 30)
    val ps = Tok.wsPieces(two, 10)
    assert(ps.mkString == two && ps.length == 2)
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
