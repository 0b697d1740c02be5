package graft.rel

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cardinality/membership sketches — the project-
  * invariant twist on the classic randomized structures: hashes are
  * md5-derived, so sketch CONTENTS (not just error bounds) are
  * reproducible across runs, partitionings and engines, and the
  * DuckDB oracle replays them value-for-value. (Spark's builtin
  * approx_count_distinct is HLL++ with engine-private registers —
  * accurate but unverifiable across engines; these are the
  * verifiable counterparts.)
  */
object Sketches {

  /** Uniform [0, 1) hash of a string: first 8 md5 hex chars / 2^32
    * (exact in double — same recipe as [[Sampling.hashBucket]]). */
  def uniformHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** KMV (k-minimum-values) distinct-count estimate: keep the k
    * smallest DISTINCT hash values; estimate = (k−1) / u_k where u_k
    * is the k-th smallest (Bar-Yossef et al. 2002, public). The
    * k-row sort+limit is bounded by k, never the corpus. */
  val DefaultK = 64

  /** Bloom bit positions of a term: `hashes` md5-derived positions in
    * a `bits`-bit filter. The filter itself is just the DISTINCT set
    * of positions — broadcastable at `bits/8` bytes regardless of how
    * many members produced it. */
  def bloomPositions(term: Column, bits: Int = 4096, hashes: Int = 3): Column =
    array((0 until hashes).map(h =>
      (conv(substring(md5(concat(lit(h.toString), lit("|"), term)), 1, 8),
        16, 10).cast("long") % bits).cast("int")): _*)
}
