package graft.rel

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class RangeJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("pointInInterval: start inclusive, end exclusive, cross-bucket spans") {
    val points = Seq(
      (1L, ts("2026-01-01 00:00:00")), // == start → in
      (2L, ts("2026-01-03 12:00:00")), // inside, different day-bucket
      (3L, ts("2026-01-04 00:00:00")), // == end → OUT (exclusive)
      (4L, ts("2026-02-01 00:00:00"))  // far outside
    ).toDF("p_id", "p_ts")
    val intervals = Seq(
      (10L, ts("2026-01-01 00:00:00"), ts("2026-01-04 00:00:00")))
      .toDF("iv_id", "iv_start", "iv_end")
    val got = RangeJoin.pointInInterval(points, intervals,
        "p_ts", "iv_start", "iv_end")
      .select("p_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("inverted intervals (end < start) are dropped before the bucket explode") {
    val points = Seq((1L, ts("2026-01-02 00:00:00"))).toDF("p_id", "p_ts")
    val intervals = Seq(
      (10L, ts("2026-01-10 00:00:00"), ts("2026-01-01 00:00:00")), // inverted
      (11L, ts("2026-01-01 00:00:00"), ts("2026-01-05 00:00:00"))) // valid
      .toDF("iv_id", "iv_start", "iv_end")
    val out = RangeJoin.pointInInterval(points, intervals,
      "p_ts", "iv_start", "iv_end")
    // only the valid interval matches, and the inverted one generated
    // no candidate rows at all (sequence would otherwise fan out a
    // DESCENDING bucket range — wasted superset work)
    assert(out.select("iv_id").as[Long].collect().toSeq == Seq(11L))
  }
}
