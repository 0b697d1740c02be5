package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.textan.TextAnalysis

/** Streaming twins of the dedup operators — the continuous-ingest
  * shape of a training-data pipeline (SURVEY §2.11 extension; the
  * reference's ingest DAG is a daily batch, `/root/reference/Airflow/
  * dags/nvidia_quarterly_reports_pipeline.py:70-71`).
  *
  * Scale notes: streaming exact dedup keeps ONE fingerprint (16-byte
  * md5) per distinct document in the state store — state is bounded
  * by distinct content, not stream length, and with RocksDB state
  * backing it spills off-heap. The watermarked variant bounds state
  * by the watermark horizon instead: a duplicate arriving later than
  * the delay is no longer caught, which is the deliberate trade for
  * O(horizon) state on an unbounded stream.
  */
object DocStreams {

  /** Content-exact dedup on a document stream: first arrival per
    * normalized-content fingerprint wins (same key as
    * [[graft.textan.TextAnalysis.contentFingerprint]], so the kept
    * set matches batch [[graft.dedup.Dedup.dropExactDuplicates]] up
    * to arrival order). */
  def dedupDocumentStream(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
      .withColumn("fingerprint", TextAnalysis.contentFingerprint(col("text")))
      .dropDuplicates("fingerprint")
  }

  /** The watermark + in-horizon dedup core: state for an `event_id`
    * lives until the watermark passes its event time + `delay`; a
    * re-delivery while the state lives is dropped, one past the
    * horizon is re-admitted — the deliberate bounded-state trade,
    * pinned batch-by-batch in DocStreamsSpec. */
  def dedupEvents(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NEAR-dup candidates against a STATIC historical
    * corpus — the continuous-ingest twin of the banded minhash
    * pipeline: each incoming document is minhash-banded on the fly
    * (narrow per-row signature, [[graft.dedup.Dedup.minhashBandKeys]]
    * — no stateful aggregation) and equi-joined against the
    * precomputed band table of the history (a stream-static inner
    * join, stateless on the stream side). Emits one
    * (doc_id, dup_of, band) row per colliding band — deliberately
    * not `distinct()`ed, which would be a stateful op; downstream
    * consumers (or the exact-cosine confirm) dedup pairs. At scale
    * the static band table is the compact (doc_id, band, 64-hex key)
    * index, not the corpus. */
  def nearDupCandidatesAgainstStatic(incoming: DataFrame,
      historyBands: DataFrame): DataFrame =
    graft.dedup.Dedup.minhashBandKeys(incoming)
      .join(historyBands
          .select(col("doc_id").as("dup_of"), col("band"), col("band_key")),
        Seq("band", "band_key"))
      .select(col("doc_id"), col("dup_of"), col("band"))

  /** LINE-level boilerplate detection on the ingest stream — the
    * continuous twin of [[graft.dedup.Dedup.lineDedup]]: each
    * incoming document segments into `lineTokens`-token lines
    * per-row (narrow explode, [[graft.dedup.Dedup.linesOf]] — no
    * stateful op; pass the SAME `lineTokens` the index was built
    * with, or the join matches fingerprints across mismatched
    * segmentations and flags nothing — ADVICE r13), the
    * line fingerprints equi-join the precomputed history index
    * (stream-static inner join, stateless on the stream side), and
    * one (doc_id, p, dup_of, first_p) row emits per historically-
    * duplicate line. At scale the static side is the compact
    * (md5, first-owner) index, never corpus text; downstream
    * reassembly drops the flagged positions exactly as the batch
    * operator does. */
  def lineDupAgainstStatic(incoming: DataFrame,
      lineIndex: DataFrame, lineTokens: Int = 10): DataFrame =
    graft.dedup.Dedup.linesOf(incoming, lineTokens)
      .select(col("doc_id"), col("p"), md5(col("line")).as("line_md5"))
      .join(lineIndex, Seq("line_md5"))
      .select(col("doc_id"), col("p"),
        col("first_doc").as("dup_of"), col("first_p"))

  /** Stream-static CDX dedup — the continuous-crawl twin of
    * [[graft.Queries.q_cdx_dedup]]: incoming fetches
    * (fetch_id, url, text) are duplicates iff the HISTORICAL index
    * already holds their (canonical URL, content digest) pair. The
    * projection is narrow and per-row (canonicalization expressions
    * + md5 — no aggregate, no window), so it runs on an unbounded
    * stream; the history side is the compact
    * (canon, digest, first_fetch) table, not the crawl. A changed
    * page (same canon, new digest) does NOT join — it flows through
    * as a new revision, exactly the batch row's keep=1 semantics.
    * Returns one row per historically-duplicate fetch. */
  def cdxDupAgainstStatic(incoming: DataFrame,
      cdxIndex: DataFrame): DataFrame =
    incoming
      .select(col("fetch_id"),
        graft.rel.Urls.canonical(col("url")).as("canon"),
        md5(col("text")).as("digest"))
      .join(cdxIndex, Seq("canon", "digest"))
      .select(col("fetch_id"), col("canon"), col("digest"),
        col("first_fetch").as("dup_of"))

  /** Streaming CROSS-MODAL pair gate — the continuous twin of
    * [[graft.Queries.q_crossmodal_curation]], proving the multimodal
    * plumbing is streaming-safe end to end: each incoming
    * (pair_id, payload, caption) row REAL-decodes its image embedding
    * ([[graft.multimodal.Multimodal.decodeClipVec]] inside
    * mapPartitions — the identical kernel the batch path runs),
    * parses the caption vector per-row
    * ([[graft.multimodal.Multimodal.captionParse]]), scores the
    * pair's cosine with the batch row's exact expression (dotF /
    * (normF·normF), rounded before the gate) and keeps pairs at or
    * above `threshold`. Everything is map-only — no state, no
    * watermark, no shuffle — so it runs on an unbounded crawl stream;
    * undecodable payloads drop (decode-or-skip). Emits
    * (pair_id, cos_sim, kept) for EVERY decodable pair (kept 0/1, so
    * the downstream writer can route keeps and drops differently);
    * batch == stream on the same pairs (spec-pinned). */
  def crossmodalGateStream(pairs: DataFrame,
      threshold: Double = 0.999): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val decoded = pairs
      .select(col("pair_id"), col("payload"), col("caption"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.flatMap { case (id, payload, caption) =>
        graft.multimodal.Multimodal.decodeClipVec(payload)
          .map(v => (id, v, caption))
      })
      .toDF("pair_id", "embedding", "caption")
    decoded
      .withColumn("q_embedding",
        graft.multimodal.Multimodal.captionParse(col("caption")))
      .withColumn("cos_sim",
        round(graft.vector.FloatVecExpr.dotF(col("embedding"), col("q_embedding")) /
          (graft.vector.FloatVecExpr.normF(col("embedding")) *
            graft.vector.FloatVecExpr.normF(col("q_embedding"))), 6))
      .select(col("pair_id"), col("cos_sim"),
        (col("cos_sim") >= threshold).cast("int").as("kept"))
  }

  /** Stream-static crawl-frontier ADMISSION — the continuous twin of
    * [[graft.Queries.q_crawl_frontier]] (r17 verdict #8), completing
    * the ingest-shaped twin set (CDX, line-dedup, DSIR, Gopher,
    * classifier): each incoming URL entry canonicalizes per-row
    * ([[graft.rel.Urls.canonical]] — narrow expressions, no state),
    * RELATIVE/scheme-less entries drop (never fetchable, the batch
    * row's filter), first-wins goes to the STATIC frontier (a
    * stream-static LEFT ANTI join on `canon` — an entry already
    * scheduled is never re-admitted), and each admission carries its
    * host's politeness continuation: `queue_base` = the host's
    * static queue depth, `fetch_at_sec = queue_base × 2` — the next
    * free slot in the batch row's `(host_rank − 1) × 2` schedule.
    * Multiple same-host admissions inside one micro-batch all see
    * the same static base (intra-batch sub-slotting would be a
    * stateful rank — that's the scheduler's merge step, exactly like
    * the near-dup twin leaving pair-dedup downstream). Duplicate
    * CANONS, by contrast, dedup here: a `dropDuplicates("canon")`
    * collapses re-sent URLs to one admission per canon per query run
    * (r18 advice — without it two same-canon entries in one batch,
    * or the same URL re-sent across batches, were each admitted,
    * since the static frontier is never updated by this twin). On a
    * stream this is Spark's stateful dedup: state is one row per
    * distinct admitted canon — the same growth rate as the frontier
    * the scheduler maintains anyway; an unbounded deployment would
    * swap in `dropDuplicatesWithinWatermark` to bound it by horizon.
    * The winner among same-batch duplicates is single-but-arbitrary
    * (all its non-id columns are identical by construction);
    * cross-RUN dedup — merging admissions back into the frontier —
    * remains the downstream scheduler merge's job. The static side
    * is the compact frontier table (canon, host, host_rank), never
    * the crawl. Batch == stream on the same entries (spec-pinned). */
  def frontierAdmitAgainstStatic(incoming: DataFrame,
      frontier: DataFrame): DataFrame = {
    val canoned = incoming
      .withColumn("canon", graft.rel.Urls.canonical(col("url")))
      .withColumn("host",
        regexp_extract(col("canon"), "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1))
      .filter(col("host") =!= "")
      .dropDuplicates("canon")
    val hostQueue = frontier.groupBy(col("host"))
      .agg(max(col("host_rank")).cast("int").as("__queued"))
    canoned
      .join(frontier.select(col("canon")), Seq("canon"), "left_anti")
      .join(hostQueue, Seq("host"), "left")
      .select(col("entry_id"), col("host"), col("canon"),
        coalesce(col("__queued"), lit(0)).cast("int").as("queue_base"),
        (coalesce(col("__queued"), lit(0)) * 2).cast("long")
          .as("fetch_at_sec"))
  }

  /** Stream-static DSIR scoring — the continuous-ingest twin of
    * [[graft.Queries.q_dsir_weights]]: incoming documents are scored
    * against FROZEN hashed LMs ([[graft.textan.Dsir.collectLm]] over
    * the history corpus — ≤1024 entries, a driver map, never a
    * corpus-sized side). The scorer is a pure per-row map
    * ([[graft.textan.Dsir.scoreExpr]] — tokenize, bucket, per-bucket
    * microunit fold in one pass), so it runs on an unbounded stream
    * with NO aggregation state, no shuffle and no watermark; scoring
    * a document against the LMs its own corpus froze is bit-identical
    * to the batch operator's row (spec-pinned). Emits
    * `(doc_id, n_feats, logw_micro)`; sub-2-token documents drop,
    * matching the batch operator's no-row semantics. */
  def dsirScoreAgainstStatic(incoming: DataFrame,
      lm: Map[Long, (Long, Long)], tt: Long, tq: Long): DataFrame =
    incoming
      .select(col("doc_id"),
        graft.textan.Dsir.scoreExpr(lm, tt, tq)(col("text")).as("__s"))
      .filter(col("__s").isNotNull)
      .select(col("doc_id"), col("__s._1").as("n_feats"),
        col("__s._2").as("logw_micro"))

  /** Watermarked event dedup: drops re-deliveries of the same
    * `event_id` arriving within `delay` of the watermark — bounded
    * state for at-least-once upstreams. */
  def dedupEventStream(spark: SparkSession, path: String,
      delay: String = "1 hour"): DataFrame = {
    val schema = spark.read.parquet(path).schema
    dedupEvents(spark.readStream.schema(schema).parquet(path), delay)
  }

  /** Streaming HLL cardinality-sketch maintenance — the continuous
    * twin of [[graft.Queries.q_hll_distinct]]'s register build. The
    * register update (max ρ per register index) is an order-free,
    * re-delivery-immune merge, so the SAME declarative aggregate
    * serves batch and stream: on a stream it is a stateful agg whose
    * entire state is ≤256 ints per sketch — the poster case for
    * mergeable-sketch state vs the unbounded distinct-set a naive
    * streaming COUNT(DISTINCT) would need. DocStreamsSpec pins
    * stream == batch register-for-register across multi-batch
    * arrival orders WITH duplicate re-deliveries. */
  def hllRegisters(terms: DataFrame): DataFrame =
    terms
      .select(graft.rel.Sketches.hllIndex(col("term")).as("idx"),
        graft.rel.Sketches.hllRho(col("term")).as("rho"))
      .groupBy(col("idx"))
      .agg(max(col("rho")).as("mrho"))

  /** Streaming Count-Min counter maintenance — the frequency-sketch
    * twin of [[hllRegisters]] with the OPPOSITE delivery contract:
    * counter updates are SUMS, so while the merge is order-free it is
    * NOT re-delivery-immune — an at-least-once upstream inflates
    * counts unless an exactly-once stage (watermarked id-dedup, as in
    * [[dedupEvents]]) runs first. DocStreamsSpec pins both halves:
    * raw re-delivery OVERcounts (still never undercounts — the CMS
    * one-sided bound survives), and dedup-then-sum equals batch cell
    * for cell. State is the d×w counter grid (≤256 longs) plus the
    * dedup stage's horizon-bounded ids. */
  def cmsCounters(terms: DataFrame, w: Int = 64, d: Int = 4): DataFrame =
    terms
      .select(posexplode(graft.rel.Sketches.bloomPositions(col("term"), w, d))
        .as(Seq("h", "pos")))
      .groupBy(col("h"), col("pos"))
      .agg(count(lit(1)).as("counter"))

  /** Incremental vector-store maintenance — the continuous-ingest
    * twin of [[graft.pipeline.RagPipeline.buildStore]]: each
    * micro-batch of documents is chunked + embedded, deduped within
    * the batch (first occurrence per id by (doc_id, chunk_index)),
    * ANTI-JOINED against the ids already in the store, and APPENDED —
    * upsert-as-append, so an id that exists keeps its original row
    * (the same first-wins contract, resolved by arrival order across
    * batches) and the store parquet is never rewritten. At 100 TB the
    * per-batch cost is the batch's own chunk/embed plus one id
    * anti-join against the store's id column — no store-wide shuffle,
    * no rewrite.
    *
    * Store existence is resolved through the Hadoop FileSystem of
    * `storePath` (not `java.io.File`), so the first-wins anti-join
    * fires on HDFS/S3 paths too. Caveat: foreachBatch + parquet
    * append is at-least-once — a batch RETRY after a partial write
    * can re-append rows the failed attempt already landed (exactly-
    * once needs a transactional table format underneath); re-reads of
    * the store remain first-wins because consumers dedup on id.
    *
    * Returns the StreamingQuery; the store lives at `storePath` as
    * plain parquet readable by the batch retrieval surface. */
  def upsertIntoStore(docs: DataFrame, storePath: String,
      strategy: String = "simple",
      embedder: graft.vector.Embedder = graft.vector.HashingEmbedder(64),
      checkpoint: String = ""): org.apache.spark.sql.streaming.StreamingQuery = {
    val cp = if (checkpoint.nonEmpty) checkpoint
      else java.nio.file.Files.createTempDirectory("graft-store-cp").toString
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fresh = graft.pipeline.RagPipeline.buildStore(batch, strategy, embedder)
        val hPath = new org.apache.hadoop.fs.Path(storePath)
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val toWrite =
          if (fs.exists(hPath)) {
            val existing = spark.read.parquet(storePath).select(col("id"))
            fresh.join(existing, Seq("id"), "left_anti")
          } else fresh
        // one file per batch at spec scale; a real deployment would
        // partition by a stable key and compact asynchronously
        toWrite.write.mode("append").parquet(storePath)
        // the commit IS the version boundary: bump the store's epoch
        // so saved-index serves re-check content exactly once per
        // micro-batch instead of once per query (SavedIndex's
        // serve-cost policy — the stream is the caller that "tracks
        // corpus versions")
        storeEpochs.merge(storePath, 1L, (a, b) => a + b)
        () // foreachBatch wants Unit, not the merged counter
      }
      .start()
  }

  // ===== store version tokens (SavedIndex epoch integration) =====

  private val storeEpochs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** The store's current version token for [[graft.io.SavedIndex]]
    * epoch serves: bumped once per committed [[upsertIntoStore]]
    * micro-batch, so a serve loop over a streaming-maintained store
    * pays ONE content re-check (and rebuild, if the batch landed new
    * rows) per micro-batch and O(1) for every serve in between —
    * never a per-serve corpus scan. None before the first commit (or
    * in a JVM that hasn't streamed into the store): the serve falls
    * back to the content fingerprint, which stays the ground truth. */
  def storeEpoch(storePath: String): Option[String] =
    Option(storeEpochs.get(storePath)).map(v => s"$storePath@$v")
}
