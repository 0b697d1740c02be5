package graft.text.chunk

import graft.io.Caches.TrackedPersistOps
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
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_index"))
    // Distances come from the PRE-normalization counts twin
    // (countsEmbedder): cosine is scale-invariant, so no breakpoint
    // can move — but with integer counts every dot/norm² is exact and
    // the whole threshold/segmentation pipeline is bit-replayable in
    // oracle SQL even for the normalized production embedder.
    //
    // For the md5-bucket count family the min-split, bucketing AND
    // adjacent distances fuse into ONE per-document kernel
    // ([[SemanticChunker.pieceDists]]): the document tokenizes once,
    // each token buckets once, and no piece text, embedding array or
    // pre-cache `lead` window exchange ever materializes — the old
    // form re-tokenized every ~minChunkTokens-piece inside the embed
    // UDF and shuffled the pieces just to pair neighbours that the
    // kernel produces adjacently anyway. Other embedders keep the
    // generic compose (min-split → embed UDF → lead window + V2).
    // Either way the cached frame is narrow: per piece just ids,
    // offsets, token count and one double.
    val withDist = (embedder.countsEmbedder match {
      case graft.vector.LatticeEmbedder(d) =>
        val ck = RecursiveChunker(chunkSize = minChunkTokens, overlap = 0)
        val f = udf((text: String) => SemanticChunker.pieceDists(ck, d, text))
        docs
          .select(col("doc_id"), col("source"),
            posexplode(f(col("text"))).as(Seq("chunk_index", "__p")))
          .select(col("doc_id"), col("source"), col("chunk_index"),
            col("__p.start").as("start"), col("__p.end").as("end"),
            col("__p.token_length").as("token_length"),
            col("__p.dist").as("dist"))
      case countsEmb =>
        val pieces = RecursiveChunker(chunkSize = minChunkTokens, overlap = 0)
          .chunk(docs)
          .select(col("doc_id"), col("source"), col("chunk_index"),
            col("text"), col("start"), col("end"), col("token_length"))
        countsEmb.embed(pieces)
          .withColumn("next_emb", lead(col("embedding"), 1).over(w))
          .withColumn("dist",
            when(col("next_emb").isNotNull,
              lit(1.0) - FloatVecExpr.dotF(col("embedding"), col("next_emb")) /
                (FloatVecExpr.normF(col("embedding")) * FloatVecExpr.normF(col("next_emb"))))
              .otherwise(lit(null)))
          .drop("embedding", "next_emb", "text")
      // tracked persist (bounded per-site lifetime, r12): the frame
      // is consumed TWICE — the eager histogram collect below and the
      // lazily-returned segmentation plan — and an eager unpersist on
      // return (the pre-r8 form) un-cached it between the two,
      // silently re-running the whole split+distance kernel at
      // consume time; the tracked registry caps accumulated entries
      // across repeated chunk() calls instead
    }).persistTracked("semantic.dists")

    {
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
        .agg(min(col("start")).cast("int").as("start"),
          max(col("end")).cast("int").as("end"))
      // `segment` is a contiguous 0-based per-doc counter (running sum
      // of break flags, first row 0), so it IS the chunk index — no
      // row_number window (and its extra per-doc sort) needed.
      // Chunk text extraction: segments roll up to ONE sorted bounds
      // array per doc and slice in a single CodePointSlices pass —
      // per-segment substr over the parent doc was O(start) each,
      // i.e. quadratic in doc length in one task on a giant document
      // (r11 row-skew harness); the rollup shuffles only int triples.
      merged.groupBy(col("doc_id"), col("source"))
        .agg(array_sort(collect_list(
          struct(col("segment"), col("start"), col("end")))).as("segs"))
        .join(docs.select(col("doc_id"), col("text").as("doc_text")), "doc_id")
        .withColumn("chunks",
          graft.text.StrExpr.codePointSlices(col("doc_text"),
            transform(col("segs"), g =>
              struct(g.getField("start"), g.getField("end")))))
        .select(col("doc_id"), col("source"),
          posexplode(arrays_zip(col("segs"), col("chunks"))).as(Seq("__i", "z")))
        .select(col("doc_id"), col("source"),
          col("z.segs.segment").cast("int").as("chunk_index"),
          col("z.chunks").as("text"),
          col("z.segs.start").as("start"), col("z.segs.end").as("end"),
          length(col("z.chunks")).as("char_length"),
          Tok.tokenCount(col("z.chunks")).as("token_length"),
          lit(strategy).as("strategy"))
    }
  }
}

/** One min-split piece with its distance to the NEXT piece of the
  * same document (None for the doc's last piece). */
case class PieceDist(start: Int, end: Int, token_length: Int,
    dist: Option[Double])

object SemanticChunker {
  import graft.vector.HashingEmbedder

  /** The fused per-document kernel: min-split offsets (the C2
    * split/merge at overlap 0), per-piece `dim`-bucket integer count
    * vectors, and adjacent cosine distances — all from ONE
    * tokenization pass. Arithmetic mirrors the Column form
    * (`1.0 − dotF/(normF·normF)`) operation for operation: products
    * and sums accumulate in Double in ascending dimension order over
    * exactly-representable integer counts, so the distances are
    * bit-identical to the generic embed-then-window path and to the
    * DuckDB oracle replay. */
  private[chunk] def pieceDists(ck: RecursiveChunker, dim: Int,
      text: String): Seq[PieceDist] = {
    if (text == null || text.isEmpty) return Nil
    val (toks, starts) = Tok.tokensAndStarts(text)
    val offs =
      ck.merge(text, ck.fragments(text, 0, text.length, ck.separators, starts), starts)
    if (offs.isEmpty) return Nil
    val n = offs.length
    // bucket each token ONCE (md5 memo-backed)
    val buckets = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) { buckets(i) = HashingEmbedder.bucket(toks(i), dim); i += 1 }
    val counts = Array.ofDim[Int](n, dim)
    val tokLen = new Array[Int](n)
    var p = 0
    while (p < n) {
      val (a, b) = offs(p)
      val lo = Tok.lowerBound(starts, a)
      val hi = Tok.lowerBound(starts, b)
      tokLen(p) = hi - lo
      var t = lo
      while (t < hi) { counts(p)(buckets(t)) += 1; t += 1 }
      p += 1
    }
    (0 until n).map { k =>
      val dist =
        if (k + 1 >= n) None
        else {
          val a = counts(k); val b = counts(k + 1)
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var j = 0
          while (j < dim) {
            val x = a(j).toDouble; val y = b(j).toDouble
            dot += x * y; na += x * x; nb += y * y
            j += 1
          }
          Some(1.0 - dot / (math.sqrt(na) * math.sqrt(nb)))
        }
      PieceDist(offs(k)._1, offs(k)._2, tokLen(k), dist)
    }
  }
}
