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
  * Implementation is pure Column expressions —
  * `posexplode(sequence(...))` + `substring` — so it stays inside
  * WholeStageCodegen, is DuckDB-oracle-expressible
  * (`unnest(generate_series(...))` + `substr`), and introduces no
  * shuffle: chunk rows are generated in the same stage as the parquet
  * scan. At 100 TB the only cost is the scan plus row fan-out.
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
        col("doc_id"), col("source"), n.as("n"), col("text"),
        posexplode(sequence(lit(0), n - 1, lit(step)))
          .as(Seq("chunk_index", "start")))
      .select(
        col("doc_id"), col("source"), col("chunk_index"),
        col("text").substr(col("start") + lit(1), lit(size)).as("text"),
        col("start"),
        least(col("start") + size, col("n")).as("end"))
      .withColumn("char_length", length(col("text")))
      .withColumn("token_length", Tok.tokenCount(col("text")))
      .withColumn("strategy", lit(strategy))
  }
}
