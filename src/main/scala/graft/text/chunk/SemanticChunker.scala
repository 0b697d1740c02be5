package graft.text.chunk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.Tok
import graft.vector.{Embedder, FloatVecExpr, HashingEmbedder}

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
    // `text` is dropped before the cache: the merged output re-slices
    // from the parent document, so the cached distances frame stays
    // narrow — per ~50-token piece just ids, offsets, token count and
    // one double, not the piece text (which would dominate the cache).
    // Distances come from the PRE-normalization counts twin
    // (countsEmbedder): cosine is scale-invariant, so no breakpoint
    // can move — but with integer counts every dot/norm² is exact and
    // the whole threshold/segmentation pipeline is bit-replayable in
    // oracle SQL even for the normalized production embedder.
    val withDist = embedder.countsEmbedder.embed(pieces)
      .withColumn("next_emb", lead(col("embedding"), 1).over(w))
      .withColumn("dist",
        when(col("next_emb").isNotNull,
          lit(1.0) - FloatVecExpr.dotF(col("embedding"), col("next_emb")) /
            (FloatVecExpr.normF(col("embedding")) * FloatVecExpr.normF(col("next_emb"))))
          .otherwise(lit(null)))
      .drop("embedding", "next_emb", "text")
      .cache()

    try {
      // Threshold selection in ONE distributed pass instead of a
      // maxIter-deep binary search (each probe was a full count job):
      // histogram the distances on a fixed grid of 2^maxIter bins over
      // [0, 2] — same granularity the binary search would reach — and
      // pick the smallest grid threshold with breaks ≤ target from
      // the (≤4k-row) driver-side cumulative. Deterministic, and the
      // collect size is grid-bound, not data-bound. The same pass
      // carries the corpus totals: `dist` is null exactly once per
      // document (the `lead` tail row), so bin −1's row count IS the
      // document count, and the per-bin token sums add up to the
      // corpus token total — no separate aggregate job.
      val bins = 1 << maxIter
      val step = 2.0 / bins
      val histo = withDist
        .groupBy(when(col("dist").isNull, lit(-1))
          .otherwise(greatest(least(floor(col("dist") / step), lit(bins - 1)), lit(0))
            .cast("int")).as("bin"))
        .agg(count(lit(1)).as("cnt"), sum(col("token_length")).as("toks"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1),
          Option(r.getAs[Any]("toks")).fold(0L)(_.toString.toLong))).toMap
      val totalToks = histo.valuesIterator.map(_._2).sum
      val nDocs = histo.getOrElse(-1, (0L, 0L))._1
      if (totalToks == 0)
        return withDist.limit(0).select(
          col("doc_id"), col("source"), col("chunk_index"),
          lit("").cast("string").as("text"), col("start"), col("end"),
          col("token_length").as("char_length"), col("token_length"),
          lit(strategy).as("strategy"))
      // target: chunks averaging ~avgChunkTokens ⇒ breakpoints ≈
      // totalToks/avg − nDocs (each doc contributes one trailing chunk)
      val targetBreaks = math.max(0L, totalToks / avgChunkTokens - nDocs)
      // breaks(t = (b+1)*step) = Σ counts of bins strictly above b
      var cum = 0L
      var threshold = 2.0
      val suffix = new Array[Long](bins + 1)
      var b = bins - 1
      while (b >= 0) {
        cum += histo.getOrElse(b, (0L, 0L))._1; suffix(b) = cum; b -= 1
      }
      var t = 0
      while (t <= bins) {
        val breaks = if (t >= bins) 0L else suffix(t)
        if (breaks <= targetBreaks) { threshold = t * step; t = bins + 1 }
        else t += 1
      }

      // boundary AFTER piece i when dist(i, i+1) > threshold
      val seg = withDist
        .withColumn("brk",
          when(lag(col("dist"), 1).over(w) > threshold, 1).otherwise(0))
        .withColumn("segment",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val merged = seg.groupBy(col("doc_id"), col("source"), col("segment"))
        .agg(min(col("start")).as("start"), max(col("end")).as("end"))
      // `segment` is a contiguous 0-based per-doc counter (running sum
      // of break flags, first row 0), so it IS the chunk index — no
      // row_number window (and its extra per-doc sort) needed
      merged
        .join(docs.select(col("doc_id"), col("text").as("doc_text")), "doc_id")
        .withColumn("text",
          col("doc_text").substr(col("start") + lit(1), col("end") - col("start")))
        .withColumn("chunk_index", col("segment").cast("int"))
        .select(col("doc_id"), col("source"), col("chunk_index"), col("text"),
          col("start"), col("end"),
          length(col("text")).as("char_length"),
          Tok.tokenCount(col("text")).as("token_length"),
          lit(strategy).as("strategy"))
    } finally withDist.unpersist()
  }
}
