package graft.textan

import graft.io.Caches.TrackedPersistOps
import graft.text.Tok
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more
  * likely its hashed n-gram features are under a TARGET distribution
  * (the high-quality corpus you want more of) than under the RAW
  * distribution, log w(x) = Σ_f [ln p̂_target(f) − ln p̂_raw(f)], then
  * select by weight. The paper's estimator exactly: bag of hashed
  * bigrams into a fixed bucket space, add-one smoothing per
  * distribution. (The paper then resamples with Gumbel noise; this
  * engine is deterministic end to end, so selection composes the
  * weights with the existing top-k/sampling operators instead —
  * documented adaptation.)
  *
  * 100 TB shape: ONE feature pass over the corpus (tokenize →
  * consecutive-pair bigrams straight off the token array, no window,
  * no per-doc sort → bucket), one (doc, bucket) aggregate — persisted
  * once, feeding both consumers — and both hashed LMs are ≤`Buckets`
  * rows, so the scoring join BROADCASTS: the corpus-sized side never
  * reshuffles by feature. Per-term contributions are rounded to
  * integer microunits before the per-doc sum (the engine's bigram-LM
  * rule), so the reduction is order-free and the output is exact
  * integers. Giant documents (the web-crawl fat tail) split into
  * token-stride parts with a one-token lookahead, so no single task
  * ever hashes a whole 50 MB document's bigrams. */
object Dsir {

  /** Hashed-feature space size. The paper uses 10k for full web
    * crawls; 1024 keeps the fixture buckets multiply-occupied so the
    * smoothing arithmetic is actually exercised. */
  val Buckets = 1024L

  /** Giant-routing threshold — same md5-per-feature kernel family as
    * the classifier, so the classifier's measured ~10 MB crossover
    * transfers (per-row cost at 8 MB ≲ 2 s, tolerable against the
    * 100 TB task median; above it the split pays for itself). */
  val SplitChars: Long = 1L << 23

  /** Token stride of one split part. */
  val PartTokens: Int = 1 << 16

  /** md5-derived deterministic bucket — same idiom as
    * [[TextAnalysis.featureWeight]], DuckDB-replayable. */
  def bucketOf(f: Column): Column =
    pmod(conv(substring(md5(concat(lit("dsir|"), f)), 1, 8), 16, 10)
      .cast("long"), lit(Buckets))

  /** Per-document importance weights: `(doc_id, n_feats,
    * logw_micro)` — the log importance weight in exact integer
    * microunits (1e-6). `isTarget` marks the rows whose feature
    * distribution defines p̂_target; all rows define p̂_raw.
    * Documents with fewer than two tokens have no bigram features
    * and no row (the weight is undefined, not zero). */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      splitChars: Long = SplitChars,
      partTokens: Int = PartTokens): DataFrame = {
    val perDoc = bucketCounts(docs, isTarget, splitChars, partTokens)
      .persistTracked("dsir.perdoc")
    // both hashed LMs from ONE aggregate over the persisted frame;
    // ≤Buckets rows each → broadcast, the corpus never reshuffles
    val lm = perDoc.groupBy(col("bucket"))
      .agg(sum(when(col("tgt") === 1, col("m")).otherwise(lit(0L))).as("c_t"),
        sum(col("m")).as("c_q"))
    val totals = lm.agg(sum(col("c_t")).as("tt"), sum(col("c_q")).as("tq"))
    perDoc.join(broadcast(lm), "bucket")
      .crossJoin(broadcast(totals))
      .withColumn("contrib", round(col("m") *
        log(((col("c_t") + 1).cast("double") / (col("tt") + lit(Buckets))) /
          ((col("c_q") + 1).cast("double") / (col("tq") + lit(Buckets))))
        * 1e6))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).cast("long").as("n_feats"),
        sum(col("contrib")).cast("long").as("logw_micro"))
  }

  /** FROZEN hashed LMs for continuous-ingest scoring: the history
    * corpus's per-bucket counts collected to a driver map (≤
    * [[Buckets]] entries by construction — the whole point of the
    * hashing trick is that the LM state is corpus-size-independent).
    * Returns `(bucket → (c_t, c_q), tt, tq)` — everything
    * [[scoreExpr]] needs to score an unbounded stream of new
    * documents statelessly. */
  def collectLm(history: DataFrame, isTarget: Column)
      : (Map[Long, (Long, Long)], Long, Long) = {
    val perDoc = bucketCounts(history, isTarget, SplitChars, PartTokens)
    val lm = perDoc.groupBy(col("bucket"))
      .agg(sum(when(col("tgt") === 1, col("m")).otherwise(lit(0L))).as("c_t"),
        sum(col("m")).as("c_q"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    (lm, lm.valuesIterator.map(_._1).sum, lm.valuesIterator.map(_._2).sum)
  }

  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Mirror of Spark's `lower()` semantics for the driver/executor
    * scorer: `UTF8String.toLowerCase` lowers pure-ASCII strings with
    * the locale-independent fast path and falls back to
    * `String.toLowerCase()` under the JVM DEFAULT locale for anything
    * else — `Locale.ROOT` here would diverge from the batch column
    * under tr/az/lt default locales (dotted/dotless I). */
  private def lowerLikeSpark(s: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { ascii = s.charAt(i) < 0x80; i += 1 }
    if (ascii) {
      val out = new Array[Char](s.length)
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        out(j) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        j += 1
      }
      new String(out)
    } else s.toLowerCase()
  }

  /** Per-row closed-form DSIR scorer over FROZEN LMs — the stateless
    * kernel of the streaming twin ([[graft.streaming.DocStreams
    * .dsirScoreAgainstStatic]]): one document row in, `(n_feats,
    * logw_micro)` out, no shuffle, no window, no aggregation state.
    * Mirrors [[importanceWeights]]' arithmetic EXACTLY — driver-side
    * tokenizer with the shared [[Tok.pattern]] over the Spark-parity
    * lowercase, the md5 bucket of [[bucketOf]] (first 4 digest bytes
    * unsigned, mod [[Buckets]] — computed arithmetically on a
    * thread-local digest, no per-feature allocation), per-bucket
    * counts first, then `round((m * ln(ratio)) * 1e6)` per bucket
    * with Spark's HALF_UP `BigDecimal.valueOf` semantics and the
    * same association — so scoring a document against the LMs its
    * own corpus froze is bit-identical to the batch operator's row
    * (spec-pinned). Documents with fewer than two tokens return
    * null, matching the batch operator's no-row. */
  def scoreExpr(lm: Map[Long, (Long, Long)], tt: Long, tq: Long)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) None
      else {
        val toks = Tok.tokenize(lowerLikeSpark(text))
        if (toks.size < 2) None
        else {
          val counts = new java.util.HashMap[Long, Long]()
          val md = md5Local.get()
          var i = 0
          while (i < toks.size - 1) {
            md.reset()
            md.update("dsir|".getBytes("UTF-8"))
            md.update(toks(i).getBytes("UTF-8"))
            md.update('_'.toByte)
            md.update(toks(i + 1).getBytes("UTF-8"))
            val d = md.digest()
            val b = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % Buckets
            counts.merge(b, 1L, (a, c) => a + c)
            i += 1
          }
          var nf = 0L
          var lw = 0L
          counts.forEach { (b, m) =>
            val (ct, cq) = lm.getOrElse(b, (0L, 0L))
            val ratio = ((ct + 1).toDouble / (tt + Buckets)) /
              ((cq + 1).toDouble / (tq + Buckets))
            lw += java.math.BigDecimal
              .valueOf(m.toDouble * math.log(ratio) * 1e6)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
            nf += m
          }
          Some((nf, lw))
        }
      }
    }

  /** `(doc_id, tgt, bucket, m)` hashed-bigram bucket counts — the one
    * corpus-sized pass. Bigrams are consecutive token-array pairs
    * (`zip_with` over two slices), bit-identical to a lag-over-window
    * but with no shuffle and no per-document sort; the count
    * aggregation is order-free, so any decomposition that produces
    * the same bigram multiset produces the same rows. Giants split
    * into [[PartTokens]]-stride parts with a ONE-TOKEN lookahead —
    * each part owns exactly the bigrams STARTING inside it, so the
    * part union is the document's bigram multiset with nothing
    * double-counted — spread with an explicit partition count
    * (pinning AQE away from re-coalescing compute-dense parts, the
    * DocSplit discipline) before the md5 hashing they parallelize. */
  private def bucketCounts(docs: DataFrame, isTarget: Column,
      splitChars: Long, partTokens: Int): DataFrame = {
    def aggBuckets(exploded: DataFrame): DataFrame = exploded
      .select(col("doc_id"), col("tgt"), bucketOf(col("bg")).as("bucket"))
      .groupBy(col("doc_id"), col("tgt"), col("bucket"))
      .agg(count(lit(1)).as("m"))
    def perRow(d: DataFrame): DataFrame = aggBuckets(
      d.select(col("doc_id"), isTarget.cast("int").as("tgt"),
        explode(TextAnalysis.bind(Tok.tokens(lower(col("text"))), ts =>
          zip_with(
            slice(ts, lit(1), greatest(size(ts) - 1, lit(0))),
            slice(ts, lit(2), greatest(size(ts) - 1, lit(0))),
            (a, b) => concat(a, lit("_"), b)))).as("bg")))
    // streaming frames can't run the existence probe (no eager action
    // on a stream); micro-batch documents are the per-row shape anyway
    val canSplit = docs.columns.contains("n_chars") && !docs.isStreaming
    if (!canSplit || docs.filter(col("n_chars") > splitChars).isEmpty)
      return perRow(docs)
    val small = perRow(docs.filter( // null n_chars routes per-row
      graft.text.chunk.DocSplit.subThreshold(col("n_chars"), splitChars)))
    val giants = docs.filter(col("n_chars") > splitChars)
    val S = partTokens
    val nsp = docs.sparkSession.sessionState.conf.numShufflePartitions
    // slice BEFORE the spread: the shuffle moves part-sized arrays
    // (≈ the giant text once), never the whole token array per part
    val parts = giants
      .select(col("doc_id"), isTarget.cast("int").as("tgt"),
        coalesce(Tok.tokens(lower(col("text"))),
          array().cast("array<string>")).as("ts"))
      .withColumn("L", size(col("ts")))
      .select(col("doc_id"), col("tgt"), col("ts"), col("L"),
        explode(sequence(lit(0),
          greatest(ceil(col("L").cast("double") / S) - 1, lit(0))
            .cast("int"))).as("p"))
      .select(col("doc_id"), col("tgt"),
        slice(col("ts"), col("p") * S + 1, lit(S + 1)).as("pts"),
        least(lit(S), col("L") - 1 - col("p") * S).cast("int").as("bc"),
        col("p"))
      .repartition(nsp, col("doc_id"), col("p"))
    // sequence(1, n) DESCENDS for n < 1 — guard the empty case
    val biFeats = when(col("bc") >= 1,
      transform(sequence(lit(1), col("bc")),
        i => concat(element_at(col("pts"), i), lit("_"),
          element_at(col("pts"), i + 1))))
      .otherwise(array().cast("array<string>"))
    small.unionByName(aggBuckets(
      parts.select(col("doc_id"), col("tgt"), explode(biFeats).as("bg"))))
  }
}
