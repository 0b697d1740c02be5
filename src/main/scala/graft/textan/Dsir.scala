package graft.textan

import graft.io.Caches.TrackedPersistOps
import graft.text.Tok
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * per-doc lag bigrams → bucket), one (doc, bucket) aggregate —
  * persisted once, feeding both consumers — and both hashed LMs are
  * ≤`Buckets` rows, so the scoring join BROADCASTS: the corpus-sized
  * side never reshuffles by feature. Per-term contributions are
  * rounded to integer microunits before the per-doc sum (the
  * engine's bigram-LM rule), so the reduction is order-free and the
  * output is exact integers. */
object Dsir {

  /** Hashed-feature space size. The paper uses 10k for full web
    * crawls; 1024 keeps the fixture buckets multiply-occupied so the
    * smoothing arithmetic is actually exercised. */
  val Buckets = 1024L

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
  def importanceWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    val toks = docs.select(col("doc_id"), isTarget.cast("int").as("tgt"),
      posexplode(Tok.tokens(lower(col("text")))).as(Seq("pos", "tok")))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val perDoc = toks
      .withColumn("a", lag(col("tok"), 1).over(wDoc))
      .filter(col("a").isNotNull)
      .select(col("doc_id"), col("tgt"),
        bucketOf(concat(col("a"), lit("_"), col("tok"))).as("bucket"))
      .groupBy(col("doc_id"), col("tgt"), col("bucket"))
      .agg(count(lit(1)).as("m"))
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
}
