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
    * the preceding fragment so concat(fragments) == original slice. */
  private[chunk] def fragments(
      text: String, start: Int, end: Int, seps: Seq[String]): Vector[(Int, Int)] = {
    if (start >= end) return Vector.empty
    // ≤ chunkSize chars ⇒ ≤ chunkSize tokens (every token is ≥ 1
    // char), so small fragments are accepted without tokenizing at
    // all; only genuinely long spans pay the regex. countRegion scans
    // in place — the old substring-per-recursion-level shape
    // re-copied and re-tokenized the same characters once per
    // separator depth.
    if (end - start <= chunkSize || Tok.countRegion(text, start, end) <= chunkSize)
      return Vector((start, end))
    seps match {
      case sep +: rest =>
        val cuts = Vector.newBuilder[Int]
        var i = text.indexOf(sep, start)
        while (i >= 0 && i + sep.length <= end) {
          cuts += i + sep.length // cut AFTER the separator
          i = text.indexOf(sep, i + sep.length)
        }
        val cutPoints = cuts.result().filter(c => c > start && c < end)
        if (cutPoints.isEmpty) fragments(text, start, end, rest)
        else {
          val bounds = (start +: cutPoints) :+ end
          bounds.sliding(2).flatMap {
            case Seq(a, b) => fragments(text, a, b, rest)
            case _         => Vector.empty
          }.toVector
        }
      case _ =>
        // terminal fallback: hard character windows (a "token" longer
        // than the budget — cannot happen with Tok's 1-char symbols,
        // kept for totality)
        (start until end by math.max(chunkSize, 1))
          .map(a => (a, math.min(a + chunkSize, end))).toVector
    }
  }

  /** Greedy merge of fragments up to the token budget with overlap
    * re-seeding. Guarantees forward progress (each chunk starts
    * strictly after the previous one). */
  private[chunk] def merge(text: String, frags: Vector[(Int, Int)]): Vector[(Int, Int)] = {
    if (frags.isEmpty) return Vector.empty
    val tokCount = frags.map { case (a, b) => Tok.countRegion(text, a, b) }
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
    val frags = fragments(text, 0, text.length, separators)
    merge(text, frags).zipWithIndex.map { case ((a, b), i) =>
      val t = text.substring(a, b)
      ChunkRow(docId, source, i, t, a, b, t.length, Tok.count(t), strategy)
    }
  }

  def chunk(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (id, src, text) => chunkDoc(id, src, text) }
      .toDF()
  }
}
