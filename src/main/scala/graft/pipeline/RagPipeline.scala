package graft.pipeline

import graft.io.Caches.TrackedPersistOps
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

  /** Saved-serve geometry of the `hybrid_indexed` retrieval mode,
    * shared verbatim with the q_rag_e2e_indexed oracle: 8 coarse
    * cells over the chunk store, 2 probed per query (each dense
    * candidate pass scores ~1/4 of the store). */
  val IndexedCells = 8
  val IndexedProbe = 2

  /** Chunk + embed a corpus into a queryable vector-store DataFrame
    * (reference `add_chunks_to_collection`, `chromadb_rag.py:110-124`):
    * id = `{source}_chunk_{index}` (F16), metadata carried columnar.
    */
  def buildStore(docs: DataFrame, strategy: String,
      embedder: Embedder = HashingEmbedder(64)): DataFrame = {
    val chunks = Chunker(strategy).chunk(docs)
    // upsert semantics (SURVEY §2.7): one row per id, FIRST occurrence
    // by (doc_id, chunk_index) — dropDuplicates would keep a
    // partition-order-dependent arbitrary row when two documents share
    // a source (the fixture reuses sources), and a nondeterministic
    // store can't be oracle-replayed; same first-wins convention as
    // Dedup.dropExactDuplicates
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("doc_id"), col("chunk_index"))
    embedder.embed(chunks)
      .withColumn("id",
        concat(col("source"), lit("_chunk_"), col("chunk_index")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Retrieve top-k chunks for query texts and assemble the cited
    * context per query. `queryTexts` are embedded with the same
    * embedder as the store (reference embeds the query with the
    * collection's embedding fn, `chromadb_rag.py:127-140`).
    *
    * `retrieval` dispatches like the reference's chunking-strategy
    * dispatch (C4): "brute" = exact cosine via the TopKPerKey
    * operator; "ivf" / "lsh" / "signlsh" = the sub-linear ANN paths,
    * with the store enumerated to numeric ids by the distributed
    * prefix sum (deterministic: id-ordered, partition-independent) —
    * "signlsh" is the md5-hyperplane LSH ([[graft.vector.Ann
    * .signLshTopK]]), the engine's deterministic banded ANN (the one
    * the q_topk_signlsh oracle hash-checks); "hybrid" =
    * reciprocal-rank fusion of the dense cosine list with a BM25
    * lexical list over the same chunk store (the calibration-free
    * dense+sparse combiner); "bm25_indexed" = lexical retrieval
    * served from the persisted bucket-partitioned inverted index
    * (build-once-serve-many). Unknown strategies raise, mirroring
    * the reference's error path. */
  /** `indexKey` (bm25_indexed only): a caller-chosen stable name for
    * the DOCUMENT SET, enabling the build-once-serve-many memo across
    * calls; the chunking strategy and embedder dim are folded into
    * the cache key automatically, so the same name with a different
    * store configuration can never serve the wrong index. Empty (the
    * default) serves from an in-memory inline build — a plan hash is
    * NOT a usable default because fresh UDF/flatMap lambdas get
    * identity hashCodes in the canonicalized plan, so identical
    * invocations hash differently (measured), and a
    * silently-colliding key would serve the wrong corpus. */
  /** `epoch` (saved-serve modes only): the caller's corpus-version
    * token, forwarded to [[graft.io.SavedIndex]] — when it matches
    * the recorded one the serve is O(1) (no fingerprint scan, no
    * store build); see SavedIndex's serve-cost policy.
    * `indexedCells` (`hybrid_indexed` only): the coarse-quantizer
    * cell count — [[IndexedCells]] is the fixed catalog geometry; a
    * corpus-proportional caller passes ~√n(chunks) (the SemDeDup
    * cost-balance argument), which is what the ScaleStress ragserve
    * probe measures. Folded into the index cache key, so differing
    * geometries can never serve each other's files. */
  def run(spark: SparkSession, docs: DataFrame, queryTexts: Seq[String],
      strategy: String = "simple",
      embedder: Embedder = HashingEmbedder(64),
      retrieval: String = "brute",
      indexKey: String = "",
      epoch: Option[String] = None,
      indexedCells: Int = IndexedCells): DataFrame = {
    import spark.implicits._
    lazy val store = buildStore(docs, strategy, embedder)
    val queries = embedder
      .embed(queryTexts.zipWithIndex.toDF("query_text", "query_id"),
        textCol = "query_text", out = "q_embedding")
    val topk = retrieval match {
      case "brute" =>
        VectorOps.topK(store, queries, TopK,
          tiebreak = Seq(col("doc_id"), col("chunk_index")))
          .select(col("query_id"), col("rank"), col("source"), col("text"))
      case "ivf" | "lsh" | "signlsh" =>
        val indexed = graft.rel.PrefixSum.exclusivePrefixSum(
          store, col("id"), lit(1L), "vec_id")
        val hits = retrieval match {
          case "ivf" =>
            val (assigned, cents) = graft.vector.Ivf.index(indexed)
            graft.vector.Ivf.topK(assigned, cents, queries, TopK)
          case "signlsh" =>
            graft.vector.Ann.signLshTopK(indexed, queries, TopK)
          case _ =>
            graft.vector.Ann.lshTopK(indexed, queries, TopK)
        }
        hits.join(indexed.select(col("vec_id"), col("source"), col("text")),
            "vec_id")
          .select(col("query_id"), col("rank"), col("source"), col("text"))
      case "hybrid" =>
        // dense + lexical candidate lists at depth 2k fused by RRF
        // (deeper lists than the final k, the usual fusion setup).
        // ONE materialization of the embedded-chunk stage: dense,
        // lexical, and the citation join-back all read this single
        // InMemoryRelation — no enumeration pass runs, because the
        // store's string `id` is already the total order the ANN
        // paths' prefix-sum enumeration would assign (vec_id is
        // id-ordered, so every doc_id tiebreak below yields the
        // identical permutation the enumerated form produced)
        val shared = store
          .persistTracked("rag.hybrid_store")
        val dense = VectorOps.topK(shared, queries, TopK * 2,
            tiebreak = Seq(col("id")))
          .select(col("query_id"), col("rank"), col("id").as("doc_id"))
        val lex = graft.text.Bm25.topK(
            shared.select(col("id").as("doc_id"), col("text")),
            queries.select(col("query_id"), col("query_text").as("qtext")),
            TopK * 2)
          .select(col("query_id"), col("rank"), col("doc_id"))
        graft.text.Bm25.rrfFuse(dense, lex, TopK)
          .withColumnRenamed("doc_id", "id")
          .join(shared.select(col("id"), col("source"), col("text")), "id")
          .select(col("query_id"), col("rank"), col("source"), col("text"))
      case "bm25_indexed" =>
        // lexical retrieval from a PERSISTED inverted index — the
        // build-once-serve-many path: first run per store builds +
        // saves, every later run is bucket-pruned serve only
        val indexed = graft.rel.PrefixSum.exclusivePrefixSum(
            store, col("id"), lit(1L), "vec_id")
          .persistTracked("rag.indexed_store")
        val corpus = indexed.select(col("vec_id").as("doc_id"), col("text"))
        val qtexts = queries.select(col("query_id"), col("query_text").as("qtext"))
        val hits =
          if (indexKey.nonEmpty) {
            // length-prefixed indexKey: plain '-' concatenation would
            // let a key containing '-' collide with another
            // (indexKey, strategy) pair and serve the wrong index
            val path = graft.text.Bm25.ensureSavedIndex(corpus,
              s"ragpipeline/${indexKey.length}:$indexKey/$strategy/${embedder.dim}")
            graft.text.Bm25.topKIndexed(
              graft.text.Bm25.loadIndex(spark, path), qtexts, TopK)
          } else
            // no stable identity for this store → serve from an
            // in-memory inline build (identical scores — shared
            // scoring tree) rather than leaking one saved index per
            // call to disk; see the indexKey doc
            graft.text.Bm25.topK(corpus, qtexts, TopK)
        hits.withColumnRenamed("doc_id", "vec_id")
          .join(indexed.select(col("vec_id"), col("source"), col("text")),
            "vec_id")
          .select(col("query_id"), col("rank"), col("source"), col("text"))
      case "hybrid_indexed" =>
        require(indexKey.nonEmpty,
          "hybrid_indexed serves from saved indexes and needs a stable " +
            "indexKey (see the indexKey doc above)")
        // the embedder CLASS is part of the key, not just its dim: a
        // same-dim different-embedder caller would otherwise produce
        // an identical key, and the O(1) epoch path — which by design
        // never re-fingerprints — would serve it the wrong index
        // (r19 review)
        hybridIndexedServe(spark, store, queries,
          indexedCacheKeyBase(indexKey, strategy, embedder, indexedCells),
          epoch, indexedCells)
      case other =>
        throw new IllegalArgumentException(
          s"unknown retrieval strategy: $other") // C4-style dispatch error
    }
    VectorOps.assembleContext(topk)
  }

  /** THE 100 TB query path: hybrid (dense + lexical) retrieval
    * composed entirely onto the SAVED serve tier (r18 verdict #1),
    * over an already-built chunk STORE — either [[buildStore]]'s
    * output (the `run("hybrid_indexed")` route) or a
    * stream-maintained store read back from parquet
    * ([[graft.streaming.DocStreams.upsertIntoStore]], with
    * `DocStreams.storeEpoch` as the epoch token so each committed
    * micro-batch triggers exactly one staleness re-check + rebuild
    * and every serve in between is O(1)).
    *
    * Build-once: the store is enumerated (distributed prefix sum →
    * dense vec_id), fit + persisted through the oracle-replayable
    * bounded-k-means saved IVF index (partitionBy("cell") on disk)
    * and the bucket-partitioned saved BM25 postings (md5(term) % 64;
    * the BM25 build reads the PERSISTED store back from the IVF
    * index's corpus files, so the store pipeline runs once for both
    * indexes). Serve-many: every later call runs ZERO build jobs
    * above the two serves — the dense list reads only the probed
    * nProbe/nCells cell files ([[graft.vector.Ivf.topKIndexed]]'s
    * storage-level pruning), the lexical list only the query terms'
    * posting buckets ([[graft.text.Bm25.topKIndexed]]), RRF fuses
    * the two bounded lists, and the citation join-back reads the
    * store with a pushed vec_id IN (…) filter over ≤ |queries|·k
    * ids. The store is never rebuilt, re-embedded or re-tokenized on
    * a serve; even the store DataFrame's CONSTRUCTION (the prefix
    * sum collects partition totals) is skipped on an epoch hit —
    * [[graft.io.SavedIndex]]'s by-name corpus (hence `store` is
    * by-name here too).
    *
    * `queries` must carry (query_id, query_text, q_embedding) —
    * embedded with the same embedder as the store. `cacheKeyBase`
    * must be a stable, collision-free identity for the (store,
    * geometry) pair — `run` builds it from the length-prefixed
    * indexKey + strategy + dim + cells. */
  def hybridIndexedServe(spark: SparkSession, store: => DataFrame,
      queries: DataFrame, cacheKeyBase: String, epoch: Option[String],
      indexedCells: Int = IndexedCells): DataFrame = {
    val (disk, cents, bm) =
      ensureIndexedServe(spark, store, cacheKeyBase, epoch, indexedCells)
    val dense = graft.vector.Ivf.topKIndexed(disk, cents,
        queries.select(col("query_id"), col("q_embedding")),
        TopK * 2, nProbe = IndexedProbe)
      .select(col("query_id"), col("rank"), col("vec_id").as("doc_id"))
    val lex = graft.text.Bm25.topKIndexed(bm,
        queries.select(col("query_id"), col("query_text").as("qtext")),
        TopK * 2)
      .select(col("query_id"), col("rank"), col("doc_id"))
    val fused = graft.text.Bm25.rrfFuse(dense, lex, TopK)
      .persistTracked("rag.indexed_fused")
    // citation lookup: the fused id set is bounded by |queries| × k,
    // so resolve it driver-side and push it as a scan filter —
    // row-group pruning instead of a full pass over the store's text
    // column (the same bounded-collect serve style as the
    // probed-cell and query-term resolutions above)
    val hitIds = fused.select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    fused.withColumnRenamed("doc_id", "vec_id")
      .join(disk.filter(col("vec_id").isin(hitIds: _*))
        .select(col("vec_id"), col("source"), col("text")), "vec_id")
      .select(col("query_id"), col("rank"), col("source"), col("text"))
  }

  /** The stable cache-key base every consumer of one saved serve
    * pair must share — `run("hybrid_indexed")` and the fusion eval
    * rows ([[graft.Queries.q_rag_fusion_overlap]]/`_curve`) all
    * derive it from the same (indexKey, strategy, embedder, cells)
    * tuple, so they hit ONE pair of saved indexes instead of each
    * building their own. Length-prefixed indexKey: plain '-'
    * concatenation would let a key containing '-' collide with
    * another (indexKey, strategy) pair and serve the wrong index;
    * the embedder CLASS is part of the key, not just its dim — a
    * same-dim different-embedder caller would otherwise produce an
    * identical key, and the O(1) epoch path (which by design never
    * re-fingerprints) would serve it the wrong index (r19 review). */
  def indexedCacheKeyBase(indexKey: String, strategy: String,
      embedder: Embedder, indexedCells: Int): String =
    s"${indexKey.length}:$indexKey/$strategy/" +
      s"${embedder.getClass.getName}-${embedder.dim}/$indexedCells"

  /** The BUILD-ONCE half of [[hybridIndexedServe]], shared with the
    * fusion eval rows so they price the production serve path
    * instead of re-fitting per run (r19 verdict #2): ensure + load
    * the saved IVF index and the saved BM25 postings over `store`
    * (by-name — an O(1) epoch hit never constructs the store
    * DataFrame, whose prefix-sum enumeration is itself a Spark job).
    * Returns (persisted enumerated corpus read from the IVF index's
    * cell files, coarse centroids, loaded BM25 index frames) — all
    * three served from memoized loads on a warm epoch, zero jobs. */
  def ensureIndexedServe(spark: SparkSession, store: => DataFrame,
      cacheKeyBase: String, epoch: Option[String],
      indexedCells: Int = IndexedCells)
      : (DataFrame, Array[Array[Double]], graft.text.Bm25.Bm25Index) = {
    def enumerated = {
      // first-wins dedup on id BEFORE enumeration — buildStore output
      // is already unique per id (no-op there), but a STREAM-
      // maintained store is at-least-once (upsertIntoStore's
      // documented caveat: a batch retry can re-append rows, and
      // 'consumers dedup on id'); indexing a duplicated id twice
      // would inflate BM25's n_docs/df and let one chunk occupy two
      // citation slots (r19 review). Build-time-only cost: the
      // window runs once per index build, never on a serve.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("doc_id"), col("chunk_index"))
      graft.rel.PrefixSum.exclusivePrefixSum(
          store.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn"),
          col("id"), lit(1L), "vec_id")
        .select(col("vec_id"), col("source"), col("text"), col("embedding"))
    }
    val ivfPath = graft.vector.Ivf.ensureSavedBoundedIndex(enumerated,
      nCells = indexedCells, rounds = 2,
      cacheKey = s"ragpipeline-ivf/$cacheKeyBase", epoch = epoch)
    val (disk, cents) = graft.vector.Ivf.loadIndex(spark, ivfPath)
    val bmPath = graft.text.Bm25.ensureSavedIndex(
      disk.select(col("vec_id").as("doc_id"), col("text")),
      s"ragpipeline-bm25/$cacheKeyBase", epoch = epoch)
    (disk, cents, graft.text.Bm25.loadIndex(spark, bmPath))
  }
}
