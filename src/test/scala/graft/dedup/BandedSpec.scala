package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class BandedSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("candidatePairs: i<j orientation, carried columns, occupancy guard") {
    val banded = Seq(
      (1L, "k1", 10), (2L, "k1", 20), (3L, "k1", 30), // k1 → 3 pairs
      (4L, "k2", 40), (5L, "k2", 50),                 // k2 → 1 pair
      (6L, "k3", 60)                                  // singleton → none
    ).toDF("doc_id", "key", "payload")
    val pairs = Banded.candidatePairs(banded, Seq("key"),
        carry = Seq("payload"))
      .orderBy("doc_a", "doc_b")
      .select("doc_a", "doc_b", "a_payload", "b_payload")
      .as[(Long, Long, Int, Int)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 10, 20), (1L, 3L, 10, 30),
      (2L, 3L, 20, 30), (4L, 5L, 40, 50)))
    // occupancy guard: k1 (3 docs) exceeds cap=2 and is dropped whole
    val guarded = Banded.candidatePairs(banded, Seq("key"),
        maxKeyOccupancy = Some(2))
      .orderBy("doc_a").select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSeq
    assert(guarded == Seq((4L, 5L)))
  }

  test("all banded consumers share the kernel's plan shape (shuffle-hash pin, reused exchange)") {
    // the discipline Banded pins: both self-join sides read ONE
    // exchange (ReusedExchange — the expensive key computation runs
    // once) and the join is a ShuffledHashJoin (no sort, no
    // broadcast that would break the reuse). AQE off for stable
    // static plans, as in the LM-scorer gate.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val consumers: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "minhash" -> Dedup.minhashCandidates(
          Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("doc_id", "text")),
        "simhash" -> Dedup.simhashCandidates(
          Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("doc_id", "text")),
        "cdc_shared" -> graft.Queries.q_cdc_shared(spark, sf))
      for ((name, df) <- consumers) {
        val plan = df.queryExecution.executedPlan
        val shj = plan.collect {
          case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j }
        val reused = plan.collect {
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r }
        assert(shj.nonEmpty,
          s"$name: banded self-join must be a ShuffledHashJoin, plan:\n$plan")
        assert(reused.nonEmpty,
          s"$name: self-join sides must share one exchange, plan:\n$plan")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
