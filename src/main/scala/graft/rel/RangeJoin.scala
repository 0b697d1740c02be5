package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unkeyed point-in-interval range join via time-bucket binning — the
  * second operator the brief names that Spark lacks a native strategy
  * for. A bare `p >= start AND p < end` join has no equi key, so
  * Spark plans a nested-loop (broadcast or cartesian) — quadratic at
  * corpus scale. Binning restores a hash join: every interval
  * explodes into the fixed-width time buckets it covers, every point
  * maps to its one bucket, the join is equi on the bucket, and the
  * original predicate remains as the residual filter (the bucket
  * match is a superset, never wrong — just not yet exact).
  *
  * Cost model: interval fan-out = ceil(span / bucket) rows per
  * interval; pick `bucketSeconds` near the typical span so the
  * fan-out is a small constant, and the whole join is one shuffle on
  * an integer key. Exact same trick as the band/bucket joins in the
  * dedup suite — candidate generation by equi key, verification by
  * the precise predicate.
  */
object RangeJoin {

  /** Join each point row to every interval containing its `pointTs`
    * (`startTs` inclusive, `endTs` exclusive). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTs: String, startTs: String, endTs: String,
      bucketSeconds: Long = 86400L): DataFrame = {
    val b = lit(bucketSeconds)
    // upper bound includes end's own bucket (NOT end−1): with a
    // sub-second `end`, a point can share end's truncated second and
    // still satisfy p < end — the extra bucket is a harmless superset
    // the residual filter prunes
    // an inverted interval (end < start) can never contain a point,
    // but `sequence` would auto-step -1 and fan it out DESCENDING —
    // spurious candidates the residual filter has to prune; drop such
    // rows before the explode instead
    val iv = intervals
      .filter(col(endTs) >= col(startTs))
      .withColumn("__bucket",
        explode(sequence(
          floor(unix_timestamp(col(startTs)) / b),
          floor(unix_timestamp(col(endTs)) / b))))
    val pt = points.withColumn("__bucket",
      floor(unix_timestamp(col(pointTs)) / b))
    pt.join(iv, "__bucket")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__bucket")
  }
}
