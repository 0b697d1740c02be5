package graft.textan

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** [[Dsir]] — importance weights must actually SEPARATE the target
  * slice from the rest: that is the whole selection mechanism. */
class DsirSpec extends AnyFunSuite with SparkTestBase {

  test("target-language docs score higher importance than the rest") {
    val docs = graft.io.Tables.documents(spark, sf)
    val w = Dsir.importanceWeights(docs, col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val mean = w.groupBy(col("lang") === "en")
      .agg(avg(col("logw_micro").cast("double") / col("n_feats")).as("mpf"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(mean(true) > mean(false),
      s"en per-feature weight ${mean(true)} not above rest ${mean(false)}")
    // no sign assertion: add-one smoothing deflates every target
    // probability by ~(B/tt − B/tq) relative to raw — a uniform
    // negative bias on BOTH groups; the selection signal is the GAP,
    // which resampling by rank preserves exactly
  }

  test("scoring join broadcasts the hashed LM (corpus never reshuffles by bucket)") {
    val docs = graft.io.Tables.documents(spark, sf)
    val plan = Dsir.importanceWeights(docs, col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "LM join fell back to a corpus-wide shuffle join")
  }
}
