package graft.io

import org.apache.spark.sql.SparkSession

/** Session-identity tokens for JVM-wide caches that hold DataFrames
  * bound to their owning session (the loadIndex memos, the result
  * cache). A bare `identityHashCode(spark)` is NOT a safe key: two
  * live sessions can collide, and a hash value reused after a
  * stopped session is GC'd would serve frames bound to a dead
  * session to an unrelated new one for the same path (r19 advice).
  * The runtime's own `sessionUUID` is `private[sql]`, so mint the
  * equivalent here: one random UUID per session instance, held in a
  * WeakHashMap — unique across live sessions by construction, and a
  * GC'd session's entry vanishes with it, so its token can never be
  * re-issued to a successor. The weak key also means this map never
  * pins a stopped session in memory. */
object Sessions {
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def uuid(spark: SparkSession): String =
    ids.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)
}
