package graft.rel

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class AsOfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin: latest at-or-before match, exact-time inclusion, tie rule, no-match drop") {
    val probes = Seq(
      (1L, 10L, ts("2026-01-01 12:00:00")), // between r1 and r2 → r1
      (2L, 10L, ts("2026-01-02 00:00:00")), // EXACTLY r2's time → r2 visible
      (3L, 10L, ts("2025-12-31 00:00:00")), // before everything → dropped
      (4L, 20L, ts("2026-01-05 00:00:00")), // equal-time right rows → highest id
      (5L, 30L, ts("2026-01-05 00:00:00"))  // key with no right rows → dropped
    ).toDF("event_id", "user_id", "ts")
    val builds = Seq(
      (100L, 10L, ts("2026-01-01 00:00:00")),
      (101L, 10L, ts("2026-01-02 00:00:00")),
      (200L, 20L, ts("2026-01-03 00:00:00")),
      (201L, 20L, ts("2026-01-03 00:00:00")) // same key+time as 200 → 201 wins
    ).toDF("o_id", "o_key", "o_time")
    val out = AsOf.asOfJoin(probes, builds,
        "user_id", "o_key", "ts", "o_time", tieBreak = "o_id")
      .select(col("event_id"), col("matched.o_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 100L, 2L -> 101L, 4L -> 201L),
      s"unexpected as-of matches: $out")
  }

  test("asOfJoin rejects inputs whose columns collide with internal/output names") {
    val probes = Seq((1L, ts("2026-01-01 00:00:00"), "x"))
      .toDF("user_id", "ts", "__k") // __k is an internal working name
    val builds = Seq((1L, ts("2026-01-01 00:00:00"), 1L))
      .toDF("o_key", "o_time", "o_id")
    val e = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(probes, builds, "user_id", "o_key", "ts", "o_time", "o_id")
    }
    assert(e.getMessage.contains("__k"))
    val probes2 = Seq((1L, ts("2026-01-01 00:00:00"), "x"))
      .toDF("user_id", "ts", "matched") // output alias collision
    val e2 = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(probes2, builds, "user_id", "o_key", "ts", "o_time", "o_id")
    }
    assert(e2.getMessage.contains("matched"))
  }

  test("asOfJoin result is independent of partition layout") {
    val probes = (1 to 200).map(i =>
      (i.toLong, (i % 7).toLong, ts(f"2026-01-${i % 28 + 1}%02d 06:00:00")))
      .toDF("event_id", "user_id", "ts")
    val builds = (1 to 60).map(i =>
      (1000L + i, (i % 7).toLong, ts(f"2026-01-${i % 28 + 1}%02d 00:00:00")))
      .toDF("o_id", "o_key", "o_time")
    def run(p: Int) = AsOf.asOfJoin(
        probes.repartition(p), builds.repartition(p),
        "user_id", "o_key", "ts", "o_time", "o_id")
      .select(col("event_id"), col("matched.o_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(2) == run(13))
  }
}
