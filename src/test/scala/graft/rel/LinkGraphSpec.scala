package graft.rel

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class LinkGraphSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("pageRank: hand-computed 2-round ranks on a 3-node chain") {
    // 0→1, 1→2 (no other edges): outdeg(0)=outdeg(1)=1, node 2 a sink
    val nodes = Seq(0L, 1L, 2L).toDF("doc_id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = LinkGraph.pageRank(nodes, edges, rounds = 2)
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("outdeg"), col("pr"))
      .as[(Long, Long, Long)].collect().toSeq
    // r1: n0 = 150000; n1 = 150000 + 85*1000000/100 = 1000000;
    //     n2 = 150000 + 850000 = 1000000
    // r2: n0 = 150000; n1 = 150000 + 85*150000/100 = 277500;
    //     n2 = 150000 + 85*1000000/100 = 1000000
    assert(got === Seq((0L, 1L, 150000L), (1L, 1L, 277500L),
      (2L, 0L, 1000000L)))
  }

  test("pageRank: ranks are exact longs — permutation-invariant") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val edges = LinkGraph.syntheticEdges(docs)
    val a = LinkGraph.pageRank(docs.select(col("doc_id")), edges, rounds = 3)
    val b = LinkGraph.pageRank(
      docs.select(col("doc_id")).repartition(7), edges.repartition(5),
      rounds = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "integer PageRank must not depend on partitioning")
  }

  test("saved ranks serve == inline pageRank fit, bit-identical") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val path = LinkGraph.ensureSavedRanks(docs,
      cacheKey = s"pagerank-spec-$sf")
    val served = spark.read.parquet(path)
    val inline = LinkGraph.pageRank(docs.select(col("doc_id")),
      LinkGraph.syntheticEdges(docs, fanout = 3), rounds = 3)
    assert(served.exceptAll(inline).isEmpty &&
      inline.exceptAll(served).isEmpty,
      "the parquet round-trip must not change a single long")
  }

  test("syntheticEdges: no self-loops, no duplicate edges, fanout bound") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val edges = LinkGraph.syntheticEdges(docs, fanout = 3)
    assert(edges.filter(col("src") === col("dst")).count() == 0)
    assert(edges.count() == edges.distinct().count())
    val maxOut = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(maxOut <= 3)
  }

  test("split_leakproof: byte-identical duplicates always share a split") {
    val out = graft.Queries.q_split_leakproof(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
    val straddlers = out.join(docs, "doc_id")
      .groupBy(col("text_md5"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(straddlers == 0, "an exact-dup cluster must live in ONE split")
    // all three splits exist and cover every document
    assert(out.count() == docs.count())
    val splits = out.select(col("split")).distinct()
      .as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }

  test("split_neardup: minhash candidate pairs always share a split") {
    val out = graft.Queries.q_split_neardup(spark, sf)
      .select(col("doc_id"), col("split"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val path = graft.dedup.Dedup.ensureSavedSignatureIndex(docs, sf)
    val pairs = graft.dedup.Dedup.candidatesFromIndex(
      spark.read.parquet(path))
    val a = out.select(col("doc_id").as("doc_a"), col("split").as("split_a"))
    val b = out.select(col("doc_id").as("doc_b"), col("split").as("split_b"))
    val straddlers = pairs.join(a, "doc_a").join(b, "doc_b")
      .filter(col("split_a") =!= col("split_b")).count()
    assert(straddlers == 0, "near-dup candidates must live in ONE split")
  }

  test("dedup_weights: every cluster contributes ~1 effective doc") {
    val out = graft.Queries.q_dedup_weights(spark, sf)
    val eff = out.agg(sum(col("eff_docs_micro"))).head().getLong(0)
    val distinct = spark.read.parquet(s"$sf/documents.parquet")
      .select(md5(col("text"))).distinct().count()
    // floor() loses < 1 microunit per doc-copy; the total effective
    // mass must sit within [distinct - n_docs*1e-6, distinct] docs
    assert(eff <= distinct * 1000000L)
    assert(eff > (distinct - 1) * 1000000L)
  }
}
