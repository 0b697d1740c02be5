package graft.text

import graft.io.Caches.TrackedPersistOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval — the classic sparse complement to the
  * dense cosine path ([[graft.vector.Ann]]): Okapi BM25 with
  * k1 = 1.2, b = 0.75, idf = ln(1 + (N − df + ½)/(df + ½)).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - postings (doc, term, tf) are one explode + one aggregate over
  *    the corpus — the same shape as the minhash signature pass;
  *  - the QUERY side is tiny and broadcast: postings are semi-joined
  *    down to query terms BEFORE any stats join, so only the posting
  *    lists of queried terms ever move — the inverted-index access
  *    pattern, expressed relationally;
  *  - per-term df is an aggregate bounded by vocabulary, joined only
  *    for queried terms; corpus-level N/avgdl is a single broadcast
  *    row (no collect);
  *  - per-query top-k goes through the row_number window that
  *    [[graft.plans.RewriteTopKWindow]] rewrites to the bounded-heap
  *    TopKPerKey operator — no per-query sort of the whole score
  *    list.
  *
  * Scores are rounded to 6 decimals BEFORE ranking so the ordering
  * (and the DuckDB oracle's) cannot depend on float summation order.
  */
object Bm25 {

  /** The four relational pieces of a BM25 index. */
  case class Bm25Index(postings: DataFrame, docLen: DataFrame,
      dfreq: DataFrame, stats: DataFrame)

  /** Query-term explode shared by both serve paths. */
  private def queryTerms(queries: DataFrame): DataFrame = queries
    .select(col("query_id"),
      explode(array_distinct(Tok.tokens(lower(col("qtext"))))).as("term"))

  /** Shared scoring + ranking tail: `matched` must carry (query_id,
    * doc_id, tf, df, dl, n_docs, avgdl). One Column tree for BOTH the
    * build-and-serve and the saved-index paths, so their scores are
    * bit-identical (and identical to the DuckDB oracle's arithmetic,
    * which mirrors this exact association). */
  private def rankMatched(matched: DataFrame, k: Int,
      k1: Double, b: Double): DataFrame = {
    val idf: Column =
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm: Column =
      col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    val scored = matched
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(idf * tfNorm), 6).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Join a query-term set against index frames — only queried terms'
    * postings flow past the first (broadcast) join. */
  private def serveFrom(postings: DataFrame, docLen: DataFrame,
      dfreq: DataFrame, stats: DataFrame, queries: DataFrame, k: Int,
      k1: Double, b: Double): DataFrame = {
    val qterms = queryTerms(queries)
    val matched = postings.join(broadcast(qterms), "term")
      .join(broadcast(dfreq.join(broadcast(qterms.select("term").distinct()), "term")),
        "term")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
    rankMatched(matched, k, k1, b)
  }

  /** Shared corpus tokenization — the one regex pass both the BM25
    * and Jaccard sides derive from. */
  private def tokensOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Tok.tokens(lower(col("text"))).as("ts"))

  private def buildIndexFromTokens(toks: DataFrame): Bm25Index = {
    // every index consumer reads 2-4 of the frames below, and docLen /
    // stats / dfreq all roll up from `postings` — without the persist
    // the tokenize + explode + (doc_id, term) aggregate replays once
    // per frame (the corpus loader pre-partitions by doc_id, so the
    // aggregate is exchange-free and exchange reuse can't bridge the
    // branches; same finding as the r10 LM-scorer rewrite). The
    // persisted frame is the compact aggregate, not the token stream;
    // Bench/Verify clear the cache between runs, and long-lived
    // serving goes through ensureSavedIndex, which materializes to
    // parquet instead.
    val postings = toks
      .select(col("doc_id"), explode(col("ts")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .persistTracked("bm25.postings")
    val docLen = postings.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"))
    val stats = docLen.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val dfreq = postings.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    Bm25Index(postings, docLen, dfreq, stats)
  }

  /** Build the index frames from a document corpus: one explode + one
    * aggregate for postings, two bounded aggregates for stats. */
  def buildIndex(docs: DataFrame): Bm25Index =
    buildIndexFromTokens(tokensOf(docs))

  /** Top-k docs per query, building the index inline. `queries`:
    * (query_id, qtext). Output: (query_id, rank, doc_id, score). */
  def topK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val idx = buildIndex(docs)
    serveFrom(idx.postings, idx.docLen, idx.dfreq, idx.stats, queries, k, k1, b)
  }

  /** Term → storage bucket for the persisted inverted index: the same
    * md5 bucketing as [[graft.vector.HashingEmbedder]] (first 8 hex
    * chars % n), so the layout is deterministic and replayable. */
  val IndexBuckets = 64

  private val bucketOf =
    udf((t: String) => graft.vector.HashingEmbedder.bucket(t, IndexBuckets))

  /** Persist an index: postings and term frequencies land
    * `partitionBy("bucket")` (md5 of the term), doc lengths and the
    * single-row corpus stats as plain parquet. Serving a query then
    * reads ONLY the buckets its terms hash to — storage-level
    * partition pruning, the build-once-serve-many layout that matters
    * at 100 TB where the index build dwarfs any single query batch.
    * Mirrors [[graft.vector.Ivf.saveIndex]]. */
  def saveIndex(docs: DataFrame, path: String): Unit = {
    val idx = buildIndex(docs)
    idx.postings.withColumn("bucket", bucketOf(col("term")))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
    idx.docLen.write.mode("overwrite").parquet(s"$path/doclen")
    idx.dfreq.withColumn("bucket", bucketOf(col("term")))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/dfreq")
    idx.stats.coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Memoized per (session UUID, path) — bounded LRU, the
    * [[graft.vector.Pq.loadIndex]] pattern: the four parquet reads
    * cost footer I/O per call, and paths are content-addressed
    * (fresh TempDirs per rebuild) so a cached entry can never go
    * stale (r19 review). */
  private val loadedIndexes = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String), Bm25Index](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Bm25Index]): Boolean =
        size() > 16
    })

  def loadIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Bm25Index = {
    // Sessions.uuid, not identityHashCode — unique per session and
    // never reused after GC (r19 advice; see graft.io.Sessions)
    val key = (graft.io.Sessions.uuid(spark), path)
    val hit = loadedIndexes.get(key)
    if (hit != null) hit
    else {
      val v = Bm25Index(
        spark.read.parquet(s"$path/postings"),
        spark.read.parquet(s"$path/doclen"),
        spark.read.parquet(s"$path/dfreq"),
        spark.read.parquet(s"$path/stats"))
      loadedIndexes.put(key, v)
      v
    }
  }

  /** Serve top-k from a loaded index with TERM-PRUNED reads: the
    * query terms' buckets become a static partition filter on the
    * postings/dfreq scans, so only |query terms| of the 64 bucket
    * directories are touched. The driver-side term collect is bounded
    * by the query batch (queries are small by definition — the corpus
    * never moves). Scores are bit-identical to [[topK]]'s: same
    * values read back, same shared Column tree. */
  def topKIndexed(idx: Bm25Index, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val buckets = queryTerms(queries).select(col("term")).distinct()
      .collect().map(r => graft.vector.HashingEmbedder.bucket(r.getString(0), IndexBuckets))
      .distinct.toSeq
    serveFrom(
      idx.postings.filter(col("bucket").isin(buckets: _*)).drop("bucket"),
      idx.docLen,
      idx.dfreq.filter(col("bucket").isin(buckets: _*)).drop("bucket"),
      idx.stats, queries, k, k1, b)
  }

  /** One saved index per cache key per JVM: build-once-serve-many,
    * with the [[graft.io.SavedIndex]] staleness contract — every
    * serve re-checks the offered corpus (content fingerprint scan,
    * or an O(1) caller-supplied `epoch` token; see SavedIndex's
    * serve-cost policy) and a mismatch rebuilds into a fresh
    * directory (the superseded one is parked for one rebuild cycle,
    * then reclaimed — SavedIndex's bounded-retention contract). A
    * changed corpus can never be served from the pre-change index. */
  private val savedIndexes = new graft.io.SavedIndex("graft-bm25-idx")

  /** `docs` is by-name (evaluated at most once): an epoch-hit serve
    * never pays the corpus construction — see [[graft.io.SavedIndex
    * .ensure]]'s by-name rationale. */
  def ensureSavedIndex(docs: => DataFrame, cacheKey: String,
      epoch: Option[String] = None): String = {
    lazy val d = docs
    savedIndexes.ensure(cacheKey, d, epoch)(p => saveIndex(d, p))
  }

  /** Token-set Jaccard ranking — the unweighted lexical cousin of
    * BM25: |Q∩D| / |Q∪D| over distinct lowercase tokens. Same
    * inverted-index access pattern (query terms broadcast, only
    * matching postings move); used as the second list in the RRF
    * fusion. */
  def tokenJaccardTopK(docs: DataFrame, queries: DataFrame, k: Int): DataFrame =
    tokenJaccardFromTokens(tokensOf(docs), queries, k)

  private def tokenJaccardFromTokens(toks: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val dterms = toks
      .select(col("doc_id"), array_distinct(col("ts")).as("ts"))
      .withColumn("n_d", size(col("ts")))
      .select(col("doc_id"), col("n_d"), explode(col("ts")).as("term"))
    val qterms = queries
      .select(col("query_id"), array_distinct(Tok.tokens(lower(col("qtext")))).as("ts"))
      .withColumn("n_q", size(col("ts")))
      .select(col("query_id"), col("n_q"), explode(col("ts")).as("term"))
    val scored = dterms.join(broadcast(qterms), "term")
      .groupBy(col("query_id"), col("doc_id"), col("n_q"), col("n_d"))
      .agg(count(lit(1)).cast("int").as("m"))
      .withColumn("score",
        round(col("m").cast("double") / (col("n_q") + col("n_d") - col("m")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** BM25 + token-Jaccard hybrid via RRF, with the corpus TOKENIZED
    * ONCE: both ranked lists derive from one persisted (doc_id,
    * tokens) frame instead of each re-running the regex pass over the
    * corpus — same scores as fusing [[topK]] and [[tokenJaccardTopK]]
    * built independently (identical downstream Column trees), one
    * fewer corpus scan. `depth` is the per-list candidate depth
    * before fusion (the usual deeper-than-k setup). */
  def hybridRrfTopK(docs: DataFrame, queries: DataFrame, k: Int,
      depth: Int): DataFrame = {
    val toks = tokensOf(docs)
      .persistTracked("bm25.hybrid_tokens")
    val idx = buildIndexFromTokens(toks)
    val lex = serveFrom(idx.postings, idx.docLen, idx.dfreq, idx.stats,
      queries, depth, 1.2, 0.75)
    rrfFuse(lex, tokenJaccardFromTokens(toks, queries, depth), k)
  }

  /** Reciprocal-rank fusion of two ranked lists (SIGIR'09 form,
    * 1/(c + rank), c = 60): the standard way to combine a lexical
    * and a similarity ranking without score calibration. Inputs need
    * (query_id, doc_id, rank); fused score is rounded before the
    * final ranking for cross-engine determinism. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Double = 60.0): DataFrame =
    rrfFuseKeyed(a, b, k, c, Nil)

  /** [[rrfFuse]] with extra grouping keys carried through every stage
    * (union → groupBy → per-key window) — what the probe-ladder
    * fusion rows use to fuse ALL rungs in ONE plan: `keys =
    * Seq("n_probe")` makes each rung an independent fusion inside one
    * aggregate + one window, value-identical per rung to a standalone
    * [[rrfFuse]] over that rung's lists (same contribution, sum — ≤2
    * commutative double addends per (query, doc) —, round-6 and
    * (desc score, doc_id) tiebreak trees, keyed). */
  def rrfFuseKeyed(a: DataFrame, b: DataFrame, k: Int, c: Double = 60.0,
      keys: Seq[String] = Nil): DataFrame = {
    val kc = keys.map(col)
    val contrib = (r: Column) => lit(1.0) / (lit(c) + r)
    val leg = (df: DataFrame) => df.select(kc ++ Seq(col("query_id"),
      col("doc_id"), contrib(col("rank")).as("contrib")): _*)
    val pooled = leg(a).unionByName(leg(b))
      .groupBy(kc ++ Seq(col("query_id"), col("doc_id")): _*)
      .agg(round(sum(col("contrib")), 6).as("rrf_score"))
    val w = Window.partitionBy(kc :+ col("query_id"): _*)
      .orderBy(desc("rrf_score"), col("doc_id"))
    pooled.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(kc ++ Seq(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_score")): _*)
  }
}
