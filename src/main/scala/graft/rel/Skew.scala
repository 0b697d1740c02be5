package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (100 TB design note, SURVEY §7.4 #7).
  *
  * AQE's skew-join split handles most cases at runtime; salting is
  * the explicit fallback when a handful of hot keys dominate a
  * shuffle join (e.g. one `doc_id` holding millions of chunks, or a
  * near-dup mega-cluster sharing one LSH bucket).
  *
  * Salting is deterministic here: the salt is derived from a stable
  * row attribute (`pmod(xxhash64(saltSource), factor)`), never from
  * `rand()` — oracle/replay determinism is a project invariant.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side's hot keys
    * split across `factor` salted sub-keys and the small side
    * replicated `factor` times. Output equals the plain join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, factor: Int = 8): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(factor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Top heavy-hitter keys of a column with their frequencies —
    * the detector that decides whether salting is needed. */
  def heavyHitters(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col(key)).limit(topN)
}
