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

  test("giant split == per-row bit-identically over randomized docs and strides") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "the", "x", "42", "...")
    for (round <- 0 until 8) {
      val stride = 2 + rnd.nextInt(9) // 2..10 tokens per part
      val docs = (0 until 12).map { i =>
        val n = rnd.nextInt(40) // 0..39 tokens, many multi-part
        val t = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
        (i.toLong, t, if (i == 11) "en" else "fr", t.length.toLong)
      } :+ ((12L, null.asInstanceOf[String], "en", 0L)) // null text
      val df = docs.toDF("doc_id", "text", "lang", "n_chars")
      def run(sc: Long, pt: Int) = Dsir
        .importanceWeights(df, col("lang") === "en", sc, pt)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val split = run(2L, stride) // nearly everything giants
      val perRow = run(Long.MaxValue, stride)
      assert(split == perRow, s"divergence at round $round stride $stride")
    }
  }

  test("frozen-LM per-row scorer == batch operator bit-identically") {
    import spark.implicits._
    val docs = graft.io.Tables.documents(spark, sf).limit(120)
    val batch = Dsir.importanceWeights(docs, col("lang") === "en")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // scoring a document against the LMs its own corpus froze must
    // reproduce the batch row exactly: same tokenizer, same bucket,
    // same per-bucket rounding, same association
    val (lm, tt, tq) = Dsir.collectLm(docs, col("lang") === "en")
    assert(lm.size <= Dsir.Buckets, "LM state must be bucket-bounded")
    val scored = docs
      .select(col("doc_id"), Dsir.scoreExpr(lm, tt, tq)(col("text")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), col("s._1"), col("s._2"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(scored == batch, "per-row frozen-LM scorer diverged from batch")
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
