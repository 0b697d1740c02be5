package graft.text.chunk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.Tok

/** C1 — fixed-size sliding-window character chunker.
  *
  * Exact semantics of the reference's `simple_chunk_text`
  * (`/root/reference/Chunking_Strats/chromadb_rag.py:49-61`,
  * constants `:28-29`): `CHUNK_SIZE=400`, `CHUNK_OVERLAP=50`, starts
  * at 0, stride `size - overlap = 350`, `while start < len(text)` so
  * the final chunk may be short and empty documents yield no chunks.
  *
  * Boundary arithmetic is pure Column expressions (`sequence`, so
  * DuckDB replays it as `unnest(generate_series(...))` + `substr`)
  * and introduces no shuffle: chunk rows are generated in the same
  * stage as the parquet scan. Chunk TEXT extraction goes through
  * [[graft.text.CodePointSlices]] — per-window `substr` over one
  * parent document is O(start) each (UTF8String scans code points
  * from 0), which made chunking O(L²/stride) in a single task on a
  * giant document (measured by the r11 row-skew harness); the
  * one-pass slicer is O(L + output) per document with values
  * identical to the substr form. At 100 TB the only cost is the
  * scan plus row fan-out; the giant-document residue is the
  * O(doc_length) walk itself, which is the output's own size.
  */
case class FixedChunker(size: Int = 400, overlap: Int = 50) extends Chunker {
  require(overlap < size, "overlap must be smaller than chunk size")
  val step: Int = size - overlap
  override val strategy = "simple"

  def chunk(docs: DataFrame): DataFrame = {
    val n = col("n_chars").cast("int")
    docs
      .filter(col("n_chars") > 0) // while start < len: empty doc → no chunks
      .select(
        col("doc_id"), col("source"), n.as("n"),
        sequence(lit(0), n - 1, lit(step)).as("starts"), col("text"))
      .select(
        col("doc_id"), col("source"), col("n"), col("starts"),
        graft.text.StrExpr.codePointSlices(col("text"),
          transform(col("starts"),
            s => struct(s, least(s + size, col("n"))))).as("chunks"))
      .select(
        col("doc_id"), col("source"),
        posexplode(arrays_zip(col("starts"), col("chunks")))
          .as(Seq("chunk_index", "z")),
        col("n"))
      .select(
        col("doc_id"), col("source"), col("chunk_index"),
        col("z.chunks").as("text"),
        col("z.starts").as("start"),
        least(col("z.starts") + size, col("n")).as("end"))
      .withColumn("char_length", length(col("text")))
      .withColumn("token_length", Tok.tokenCount(col("text")))
      .withColumn("strategy", lit(strategy))
  }
}
