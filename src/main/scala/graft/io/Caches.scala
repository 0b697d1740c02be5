package graft.io

import org.apache.spark.sql.SparkSession

/** The documented cleanup path for the engine's internal persists.
  *
  * Several operators persist compact intermediate frames
  * (MEMORY_AND_DISK) that feed the lazy DataFrame they return — e.g.
  * [[graft.dedup.Dedup]]'s tokenized corpus and gram fan-out,
  * [[graft.text.Bm25]]'s postings aggregate, the LM-scorer count
  * frames in [[graft.Queries]]. Those persists cannot be unpersisted
  * inside the operator (the returned frame is still lazy and may be
  * acted on many times), so each call leaves an entry in Spark's
  * CacheManager. The engine's own drivers (Bench / Verify /
  * ScaleStress) call [[clearAll]] between queries; a long-lived
  * library consumer should do the same at its own batch boundaries —
  * e.g. after materializing a dedup pass — or the entries accumulate
  * for the life of the session.
  */
object Caches {

  /** Drop every cached/persisted frame in the session — the batch
    * boundary call for long-lived consumers. Safe at any time:
    * persisted data is a recomputable cache, never the source of
    * truth, so the only cost of clearing early is recompute. */
  def clearAll(spark: SparkSession): Unit =
    spark.sharedState.cacheManager.clearCache()
}
