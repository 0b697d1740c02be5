package graft.text.chunk

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.text.Tok

/** One produced chunk with char offsets into the source document. */
case class ChunkRow(
    doc_id: Long, source: String, chunk_index: Int, text: String,
    start: Int, end: Int, char_length: Int, token_length: Int,
    strategy: String)

/** C2 — recursive separator-based chunker.
  *
  * Reference: `RecursiveTokenChunker(chunk_size=400, chunk_overlap=50,
  * separators=["\n\n","\n",".","?","!"," ",""])`
  * (`/root/reference/Chunking_Strats/chromadb_rag.py:64-72`) — a
  * LangChain-style splitter: try the coarsest separator first, recurse
  * into oversize pieces with finer separators, then greedily merge
  * adjacent fragments up to the token budget, re-seeding each next
  * chunk with ~`overlap` tokens of trailing context.
  *
  * This is a clean-room deterministic re-spec (not a port): fragments
  * keep their birth offsets, chunk text is the exact substring
  * `text[start, end)` of the document, token counts use [[Tok]].
  * Recursion over arbitrary separators is not SQL-expressible, so this
  * is a `flatMap` over `Dataset[Doc]` (SURVEY §2.12) — still
  * narrow/shuffle-free and parallel in `doc_id`, so it scales exactly
  * like C1: one pass over the corpus, no exchange.
  */
case class RecursiveChunker(
    chunkSize: Int = 400, overlap: Int = 50,
    separators: Seq[String] = Seq("\n\n", "\n", ".", "?", "!", " "))
  extends Chunker {
  require(overlap < chunkSize)
  override val strategy = "recursive"

  /** Split `[start,end)` of doc into fragments of ≤ chunkSize tokens,
    * trying separators coarse→fine; separator chars stay attached to
    * the preceding fragment so concat(fragments) == original slice.
    * `starts` is the document's one-pass [[Tok.tokenStarts]] array —
    * every region count is a binary search, so the whole recursion
    * tokenizes each character exactly once (the old per-fragment
    * matcher regions were the measured kernel floor). */
  private[chunk] def fragments(text: String, start: Int, end: Int,
      seps: Seq[String], starts: Array[Int]): Vector[(Int, Int)] = {
    if (start >= end) return Vector.empty
    // ≤ chunkSize chars ⇒ ≤ chunkSize tokens (every token is ≥ 1
    // char), so small fragments are accepted without counting at all
    if (end - start <= chunkSize || Tok.countStarts(starts, start, end) <= chunkSize)
      return Vector((start, end))
    seps match {
      case sep +: rest =>
        val cuts = Vector.newBuilder[Int]
        var i = RecursiveChunker.indexOfBounded(text, sep, start, end)
        while (i >= 0) {
          cuts += i + sep.length // cut AFTER the separator
          i = RecursiveChunker.indexOfBounded(text, sep, i + sep.length, end)
        }
        val cutPoints = cuts.result().filter(c => c > start && c < end)
        if (cutPoints.isEmpty) fragments(text, start, end, rest, starts)
        else {
          val bounds = (start +: cutPoints) :+ end
          bounds.sliding(2).flatMap {
            case Seq(a, b) => fragments(text, a, b, rest, starts)
            case _         => Vector.empty
          }.toVector
        }
      case _ =>
        // terminal fallback: windows of chunkSize TOKENS whose edges
        // SNAP to entries of `starts` — a raw character window could
        // cut mid-token (e.g. a separator-free comma-joined region),
        // and then chunkDoc's countStarts token_length and a
        // re-tokenization of the substring would disagree for the
        // same chunk. Cutting only at token starts keeps the cut
        // invariant every other path guarantees. Unreachable with the
        // default separator list (regions with > chunkSize of Tok's
        // ≥1-char tokens always contain a space or symbol cut), kept
        // total for custom separator lists.
        val lo = Tok.lowerBound(starts, start)
        val hi = Tok.lowerBound(starts, end)
        val step = math.max(chunkSize, 1)
        if (hi - lo <= step) Vector((start, end))
        else {
          val cuts = ((lo + step) until hi by step).map(starts(_)).toVector
          ((start +: cuts) :+ end).sliding(2).collect {
            case Seq(a, b) if a < b => (a, b)
          }.toVector
        }
    }
  }

  /** Greedy merge of fragments up to the token budget with overlap
    * re-seeding. Guarantees forward progress (each chunk starts
    * strictly after the previous one). */
  private[chunk] def merge(text: String, frags: Vector[(Int, Int)],
      starts: Array[Int]): Vector[(Int, Int)] = {
    if (frags.isEmpty) return Vector.empty
    val tokCount = frags.map { case (a, b) => Tok.countStarts(starts, a, b) }
    val out = Vector.newBuilder[(Int, Int)]
    var lo = 0
    while (lo < frags.length) {
      var hi = lo
      var toks = tokCount(lo)
      while (hi + 1 < frags.length && toks + tokCount(hi + 1) <= chunkSize) {
        hi += 1; toks += tokCount(hi)
      }
      out += ((frags(lo)._1, frags(hi)._2))
      if (hi + 1 >= frags.length) { lo = frags.length }
      else {
        // back up over trailing fragments until ≥ overlap tokens,
        // but always advance past `lo`
        var back = hi
        var otoks = 0
        while (back > lo && otoks + tokCount(back) <= overlap) {
          otoks += tokCount(back); back -= 1
        }
        lo = math.max(back + 1, lo + 1)
      }
    }
    out.result()
  }

  def chunkDoc(docId: Long, source: String, text: String): Seq[ChunkRow] = {
    if (text == null || text.isEmpty) return Seq.empty
    val starts = Tok.tokenStarts(text)
    val frags = fragments(text, 0, text.length, separators, starts)
    merge(text, frags, starts).zipWithIndex.map { case ((a, b), i) =>
      val t = text.substring(a, b)
      ChunkRow(docId, source, i, t, a, b, t.length,
        Tok.countStarts(starts, a, b), strategy)
    }
  }

  /** Offsets-only split+merge — the kernel of [[chunk]], one
    * `(start, end)` pair per produced chunk. */
  private[chunk] def mergedOffsets(text: String): Array[(Int, Int)] =
    if (text == null || text.isEmpty) Array.empty
    else {
      val starts = Tok.tokenStarts(text)
      merge(text, fragments(text, 0, text.length, separators, starts), starts).toArray
    }

  /** The recursion itself is imperative, but only the OFFSETS cross
    * the UDF boundary: rows fan out through `posexplode` (a
    * generator, same stage as the scan) and the chunk text is a
    * columnar `substr` of the parent document — no Dataset encoder
    * round-trip per chunk row, which was the measured cost floor of
    * the old typed `flatMap` form (it decoded and re-encoded every
    * ~50-token piece as a full 9-field case class). SemanticChunker's
    * min-split rides this same path. */
  def chunk(docs: DataFrame): DataFrame = {
    val offsUdf = udf((text: String) => mergedOffsets(text))
    docs
      .select(col("doc_id"), col("source"), col("text").as("__doc_text"))
      .select(col("doc_id"), col("source"),
        offsUdf(col("__doc_text")).as("__offs"), col("__doc_text"))
      // one-pass slice extraction (CodePointSlices) instead of a
      // per-chunk substr over the parent doc — O(start) each made a
      // giant document's chunking quadratic in ONE task (r11 row-skew
      // harness); offsets are ascending so the slicer walks forward
      .select(col("doc_id"), col("source"), col("__offs"),
        graft.text.StrExpr.codePointSlices(col("__doc_text"),
          col("__offs")).as("__chunks"))
      .select(col("doc_id"), col("source"),
        posexplode(arrays_zip(col("__offs"), col("__chunks")))
          .as(Seq("chunk_index", "__z")))
      .select(col("doc_id"), col("source"), col("chunk_index"),
        col("__z.__chunks").as("text"),
        col("__z.__offs._1").as("start"), col("__z.__offs._2").as("end"))
      .withColumn("char_length", length(col("text")))
      .withColumn("token_length", Tok.tokenCount(col("text")))
      .withColumn("strategy", lit(strategy))
  }
}

object RecursiveChunker {
  /** `text.indexOf(sep)` restricted to matches fully inside
    * `[from, end)` — and, critically, whose SCAN is also bounded by
    * `end`. `String.indexOf(sep, from)` searches to the end of the
    * whole string before reporting a miss, so a recursion region
    * that lacks a separator paid O(text tail) per region: at the
    * semantic min-split (chunkSize 10) every ~12-token sentence
    * recursed past "." into "?"/"!" — absent from the fixture
    * corpus — and one 50 MB document cost 580k regions × O(50 MB)
    * tail scans (the r11 row-skew harness measured the semantic
    * kernel ~quadratic while the 400-token recursive chunker, which
    * accepts sentence pieces before recursing, stayed linear).
    * Returns the match START (callers cut after `sep`). */
  private[chunk] def indexOfBounded(text: String, sep: String,
      from: Int, end: Int): Int = {
    if (sep.isEmpty) return -1
    val c0 = sep.charAt(0)
    val last = end - sep.length
    var i = math.max(from, 0)
    while (i <= last) {
      if (text.charAt(i) == c0) {
        var j = 1
        while (j < sep.length && text.charAt(i + j) == sep.charAt(j)) j += 1
        if (j == sep.length) return i
      }
      i += 1
    }
    -1
  }
}
