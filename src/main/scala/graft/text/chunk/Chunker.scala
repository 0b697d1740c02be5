package graft.text.chunk

import org.apache.spark.sql.DataFrame

/** Chunking strategy surface (reference C4 dispatch,
  * `/root/reference/Chunking_Strats/chromadb_rag.py:184-200`:
  * "simple" | "recursive" | "semantic").
  *
  * Input contract: a documents DataFrame with at least
  * `(doc_id LONG, text STRING, source STRING, n_chars LONG)` —
  * the fixture `documents.parquet` shape.
  *
  * Output contract (FIXTURES.md "Derived chunk table", shape fixed by
  * `/root/reference/Chunking_Strats/chunk_visualizer.py:36-44`):
  * `(doc_id, source, chunk_index INT, text, start INT, end INT,
  *   char_length INT, token_length INT, strategy STRING)`.
  * `start`/`end` are 0-based char offsets carried from birth so the
  * interval analytics (SURVEY §2 J3/J4/W4) never re-locate chunks.
  * `chunk_index` MUST be dense 0..n−1 per document — the giant-doc
  * renumbering ([[DocSplit.chunkParts]]) computes global indexes as
  * base(part) + local and ASSERTS this density per part (raise_error
  * on the tiny per-part count table), so a violating implementation
  * fails fast instead of silently emitting gapped global ids.
  *
  * Scale note: every implementation is embarrassingly parallel in
  * `doc_id` — no shuffle is introduced by chunking itself; rows fan
  * out inside the same stage (generator / flatMap), so a 100 TB corpus
  * chunks at scan speed.
  */
trait Chunker {
  def strategy: String
  def chunk(docs: DataFrame): DataFrame
}

object Chunker {
  /** C4 strategy dispatch. Unknown strategy → error, like the
    * reference's `raise ValueError` (`chromadb_rag.py:199-200`). */
  def apply(strategy: String): Chunker = strategy match {
    case "simple"    => FixedChunker()
    case "recursive" => RecursiveChunker()
    case "semantic"  => SemanticChunker()
    case other => throw new IllegalArgumentException(
      s"Unknown chunking strategy: $other")
  }
}
