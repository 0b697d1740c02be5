package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + semantic checks of the full catalog on sf0.001 (the t2
  * oracle equivalence itself is driver-run on sf0.01; parity is also
  * locally checked by tools/check_parity.py). */
class QueriesSpec extends AnyFunSuite with SparkTestBase {

  test("entry: flagship RAG slice returns a context per query") {
    val out = SparkEntry.entry(spark).collect()
    assert(out.length == 2) // two query texts
    assert(out.forall(_.getString(1).startsWith("Source [1] (")))
  }

  test("every declared query runs and yields a sane row count on sf0.001") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    // legitimately empty at this sf: no dup texts, no ≥0.9-cos pairs,
    // and every customer has an order (so anti-join is empty)
    val mustBeNonEmpty = counts.keySet -- Set(
      "q_dedup_exact", "q_near_dup_cosine", "q_near_dup_lsh",
      "q_near_dup_signlsh", "q_ngram_jaccard", "q_anti_join")
    mustBeNonEmpty.foreach { n =>
      assert(counts(n) > 0, s"$n returned 0 rows")
    }
  }

  test("every oracleSql key has a matching queries key") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("top-k retrieval: rank 1 of a self-query is the query vector itself") {
    val r = Queries.q_topk_cosine(spark, sf)
      .filter(col("rank") === 1)
      .select("query_id", "vec_id").collect()
    assert(r.forall(row => row.getLong(0) == row.getLong(1)))
  }

  test("chunk queries agree on totals") {
    val chunks = Queries.q_chunk_fixed(spark, sf).count()
    val summary = Queries.q_chunk_summary(spark, sf)
      .select("chunk_count").head().getLong(0)
    assert(chunks == summary)
  }

  test("histogram counts sum to table size") {
    val total = Queries.q_histogram(spark, sf)
      .agg(sum("count")).head().getLong(0)
    val orders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(total == orders)
  }
}
