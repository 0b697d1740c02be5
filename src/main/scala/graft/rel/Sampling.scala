package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, key-addressed sampling (north-star extension):
  * keep a row iff the first 16 bits of md5(key) fall below
  * fraction·2^16. Unlike `df.sample`/`rand()`, the decision is a pure
  * function of the KEY — reproducible across runs, partitionings and
  * cluster sizes, stable under re-ingestion, and expressible in any
  * md5-capable engine (the DuckDB oracle hash-matches it).
  *
  * At 100 TB this is the only sampling that composes: the filter
  * rides the scan (no shuffle, no RNG state), the same fraction of
  * every future delta lands in the sample, and a join of two tables
  * sampled on the SAME key stays consistent (both keep the same
  * keys). Salt the key (`concat(lit(salt), key)`) for independent
  * re-draws.
  */
object Sampling {
  /** 16-bit bucket of md5(key): 0 ≤ bucket < 65536. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  /** The 90/5/5 train/val/test cuts over the 16-bit [[hashBucket]]
    * space — ONE definition shared by the batch split rows
    * ([[graft.Queries.q_split_leakproof]]/`q_split_neardup`) and the
    * streaming assignment twin ([[graft.streaming.DocStreams
    * .splitAssignAgainstStatic]]), so the two sides cannot drift:
    * 58982 = ⌊0.90·65536⌋, 62259 = ⌊0.95·65536⌋. */
  val TrainCut = 58982
  val ValCut = 62259

  /** train/val/test label for a [[hashBucket]] value under the
    * shared cuts. */
  def splitOf(bucket: Column): Column =
    when(bucket < TrainCut, "train")
      .when(bucket < ValCut, "val")
      .otherwise("test")

  /** Rows whose bucket < fraction·65536 — ≈fraction of any corpus,
    * exactly reproducible. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.filter(hashBucket(key) < math.round(fraction * 65536).toInt)
  }

  /** Per-stratum fractions (e.g. language quotas): the threshold is
    * looked up from a map literal on the stratum column; strata
    * absent from `fractions` are dropped. Same key-addressed
    * reproducibility as [[deterministicSample]], still a pure scan
    * filter — the quota map is a broadcast-free expression literal. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0))
    val thresholds = map(fractions.flatMap { case (s, f) =>
      Seq(lit(s), lit(math.round(f * 65536).toInt))
    }.toSeq: _*)
    df.filter(hashBucket(key) <
      coalesce(element_at(thresholds, stratum.cast("string")), lit(0)))
  }
}
