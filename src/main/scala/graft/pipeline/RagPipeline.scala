package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.chunk.Chunker
import graft.vector.{Embedder, HashingEmbedder, VectorOps}

/** The flagship end-to-end flow, mirroring the reference's
  * `rag_pipeline(url, query, chunking_strategy)`
  * (`/root/reference/Chunking_Strats/chromadb_rag.py:184-212`):
  * fetch → chunk → embed+store → retrieve top-k → assemble cited
  * context. The LLM generation step (`:154-181`) is an external
  * service and deliberately out of the data plane (SURVEY §7.4 #5) —
  * the pipeline's product is the retrieval result and the assembled
  * prompt context.
  */
object RagPipeline {
  val TopK = 5 // chromadb_rag.py:18

  /** Chunk + embed a corpus into a queryable vector-store DataFrame
    * (reference `add_chunks_to_collection`, `chromadb_rag.py:110-124`):
    * id = `{source}_chunk_{index}` (F16), metadata carried columnar.
    */
  def buildStore(docs: DataFrame, strategy: String,
      embedder: Embedder = HashingEmbedder(64)): DataFrame = {
    val chunks = Chunker(strategy).chunk(docs)
    embedder.embed(chunks)
      .withColumn("id",
        concat(col("source"), lit("_chunk_"), col("chunk_index")))
      .dropDuplicates("id") // upsert semantics, SURVEY §2.7
  }

  /** Retrieve top-k chunks for query texts and assemble the cited
    * context per query. `queryTexts` are embedded with the same
    * embedder as the store (reference embeds the query with the
    * collection's embedding fn, `chromadb_rag.py:127-140`). */
  def run(spark: SparkSession, docs: DataFrame, queryTexts: Seq[String],
      strategy: String = "simple",
      embedder: Embedder = HashingEmbedder(64)): DataFrame = {
    import spark.implicits._
    val store = buildStore(docs, strategy, embedder)
    val queries = embedder
      .embed(queryTexts.zipWithIndex.toDF("query_text", "query_id"),
        textCol = "query_text", out = "q_embedding")
    val topk = VectorOps.topK(store, queries, TopK,
      tiebreak = Seq(col("doc_id"), col("chunk_index")))
    VectorOps.assembleContext(
      topk.select(col("query_id"), col("rank"), col("source"), col("text")))
  }
}
