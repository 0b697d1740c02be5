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
  def run(spark: SparkSession, docs: DataFrame, queryTexts: Seq[String],
      strategy: String = "simple",
      embedder: Embedder = HashingEmbedder(64),
      retrieval: String = "brute",
      indexKey: String = ""): DataFrame = {
    import spark.implicits._
    val store = buildStore(docs, strategy, embedder)
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
      case other =>
        throw new IllegalArgumentException(
          s"unknown retrieval strategy: $other") // C4-style dispatch error
    }
    VectorOps.assembleContext(topk)
  }
}
