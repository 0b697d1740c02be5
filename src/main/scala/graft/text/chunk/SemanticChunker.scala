package graft.text.chunk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.Tok
import graft.vector.{Embedder, HashingEmbedder, VectorOps}

/** C3 — semantic (Kamradt-modified) chunker.
  *
  * Reference: `KamradtModifiedChunker(avg_chunk_size=300,
  * min_chunk_size=50)` (`/root/reference/Chunking_Strats/
  * chromadb_rag.py:75-93`, `kamredt_chunking.py:124-131`): split the
  * document into ~min-size token pieces, embed each piece, measure
  * cosine distance between adjacent pieces, then binary-search a
  * breakpoint threshold so the merged chunks average ~avg-size
  * tokens; pieces between breakpoints merge into one chunk.
  *
  * Spark-first composition (SURVEY §2.9 C3): C2 min-split → E1 embed
  * → `lead` window + V2 cosine → bounded driver loop of ≤20 cheap
  * COUNT aggregates over a cached distances frame (the only
  * driver-side values are two scalars per iteration) → running-sum
  * segment ids → `groupBy(doc, segment)` merge. Scale: the cached
  * distances frame is one row per ~50-token piece, partitioned by
  * doc_id; each binary-search step is a metadata-light count, and the
  * final merge is a single shuffle keyed on (doc_id, segment).
  */
case class SemanticChunker(
    avgChunkTokens: Int = 300, minChunkTokens: Int = 50,
    embedder: Embedder = HashingEmbedder(64), maxIter: Int = 12)
  extends Chunker {
  override val strategy = "semantic"

  def chunk(docs: DataFrame): DataFrame = {
    val pieces = RecursiveChunker(chunkSize = minChunkTokens, overlap = 0)
      .chunk(docs)
      .select(col("doc_id"), col("source"), col("chunk_index"),
        col("text"), col("start"), col("end"), col("token_length"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_index"))
    val withDist = embedder.embed(pieces)
      .withColumn("next_emb", lead(col("embedding"), 1).over(w))
      .withColumn("dist",
        when(col("next_emb").isNotNull,
          lit(1.0) - VectorOps.cosine(col("embedding"), col("next_emb")))
          .otherwise(lit(null)))
      .drop("embedding", "next_emb")
      .cache()

    try {
      val agg = withDist.agg(
        sum(col("token_length")).as("toks"),
        countDistinct(col("doc_id")).as("docs")).head()
      val totalToks = Option(agg.getAs[Any]("toks")).fold(0L)(_.toString.toLong)
      val nDocs = agg.getAs[Long]("docs")
      if (totalToks == 0)
        return withDist.limit(0).select(
          col("doc_id"), col("source"), col("chunk_index"), col("text"),
          col("start"), col("end"),
          col("token_length").as("char_length"), col("token_length"),
          lit(strategy).as("strategy"))
      // target: chunks averaging ~avgChunkTokens ⇒ breakpoints ≈
      // totalToks/avg − nDocs (each doc contributes one trailing chunk)
      val targetBreaks = math.max(0L, totalToks / avgChunkTokens - nDocs)
      var lo = 0.0; var hi = 2.0
      var iter = 0
      while (iter < maxIter) {
        val mid = (lo + hi) / 2
        val breaks = withDist.filter(col("dist") > mid).count()
        if (breaks > targetBreaks) lo = mid else hi = mid
        iter += 1
      }
      val threshold = hi // smallest probed threshold with breaks ≤ target

      // boundary AFTER piece i when dist(i, i+1) > threshold
      val seg = withDist
        .withColumn("brk",
          when(lag(col("dist"), 1).over(w) > threshold, 1).otherwise(0))
        .withColumn("segment",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val merged = seg.groupBy(col("doc_id"), col("source"), col("segment"))
        .agg(min(col("start")).as("start"), max(col("end")).as("end"))
      val segW = Window.partitionBy(col("doc_id")).orderBy(col("start"))
      merged
        .join(docs.select(col("doc_id"), col("text").as("doc_text")), "doc_id")
        .withColumn("text",
          col("doc_text").substr(col("start") + lit(1), col("end") - col("start")))
        .withColumn("chunk_index", row_number().over(segW) - lit(1))
        .select(col("doc_id"), col("source"), col("chunk_index"), col("text"),
          col("start"), col("end"),
          length(col("text")).as("char_length"),
          Tok.tokenCount(col("text")).as("token_length"),
          lit(strategy).as("strategy"))
    } finally withDist.unpersist()
  }
}
