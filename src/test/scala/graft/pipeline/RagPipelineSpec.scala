package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.vector.{HashingEmbedder, VectorOps}

class RagPipelineSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("buildStore: ids are {source}_chunk_{i}, upsert dedups ids (V1)") {
    val store = RagPipeline.buildStore(docs, "simple")
    assert(store.filter(!col("id").rlike("^src[0-9]+_chunk_[0-9]+$")).count() == 0)
    assert(store.groupBy("id").count().filter(col("count") > 1).count() == 0)
    assert(store.schema("embedding").dataType.simpleString == "array<float>")
  }

  test("vector store round-trips through parquet and retrieval still works") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-store").toString
    RagPipeline.buildStore(docs, "simple").write.mode("overwrite").parquet(tmp)
    val store = spark.read.parquet(tmp)
    val embedder = HashingEmbedder(64)
    val q = {
      import spark.implicits._
      embedder.embed(
        Seq(("spark window merge join", 0)).toDF("query_text", "query_id"),
        textCol = "query_text", out = "q_embedding")
    }
    val topk = VectorOps.topK(store, q, RagPipeline.TopK,
      Seq(col("doc_id"), col("chunk_index")))
    assert(topk.count() == RagPipeline.TopK)
    // rank-1 chunk must contain at least one query token
    val best = topk.filter(col("rank") === 1).head().getAs[String]("text")
    assert(Seq("spark", "window", "merge", "join").exists(best.contains))
  }

  test("run: end-to-end context per query for every strategy") {
    for (strategy <- Seq("simple", "recursive", "semantic")) {
      val out = RagPipeline.run(spark, docs.limit(50),
        Seq("table scan filter"), strategy).collect()
      assert(out.length == 1)
      assert(out(0).getString(1).split("\n\n").length == RagPipeline.TopK)
    }
  }

  test("unknown strategy raises like the reference dispatch (C4)") {
    val e = intercept[IllegalArgumentException] {
      graft.text.chunk.Chunker("bogus")
    }
    assert(e.getMessage.contains("bogus"))
  }

  test("run: hybrid retrieval fuses dense and lexical lists into a full context") {
    val out = RagPipeline.run(spark, docs.limit(50),
      Seq("table scan filter"), "simple", retrieval = "hybrid").collect()
    assert(out.length == 1)
    assert(out(0).getString(1).split("\n\n").length == RagPipeline.TopK,
      "hybrid: context must cite TopK chunks")
    // the query words appear verbatim in the corpus, so the lexical
    // list is non-degenerate: at least one cited chunk contains one
    assert(Seq("table", "scan", "filter")
      .exists(w => out(0).getString(1).contains(w)))
  }

  test("run: bm25_indexed serves from the saved index and matches inline lexical top ranks") {
    val out = RagPipeline.run(spark, docs.limit(50),
      Seq("table scan filter"), "simple", retrieval = "bm25_indexed",
      indexKey = "ragpipeline-spec-store").collect()
    assert(out.length == 1)
    assert(out(0).getString(1).split("\n\n").nonEmpty)
    // second run with the same stable key hits the memoized saved
    // index (serve-only) and is value-identical; an unkeyed run
    // builds fresh and must also agree
    val again = RagPipeline.run(spark, docs.limit(50),
      Seq("table scan filter"), "simple", retrieval = "bm25_indexed",
      indexKey = "ragpipeline-spec-store").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    val unkeyed = RagPipeline.run(spark, docs.limit(50),
      Seq("table scan filter"), "simple", retrieval = "bm25_indexed").collect()
    assert(out.map(_.toSeq).toSeq == unkeyed.map(_.toSeq).toSeq)
  }

  test("run: hybrid_indexed composes BOTH saved serves — warm epoch serve is build-free and value-identical") {
    val corpus = docs.limit(50)
    val key = "ragpipeline-spec-hybrid-indexed"
    val epoch = Some("spec-hybrid-indexed-v1")
    // cold call: builds + persists the saved IVF and BM25 indexes
    val out = RagPipeline.run(spark, corpus,
      Seq("table scan filter"), "simple", retrieval = "hybrid_indexed",
      indexKey = key, epoch = epoch).collect()
    assert(out.length == 1)
    assert(out(0).getString(1).split("\n\n").length == RagPipeline.TopK,
      "hybrid_indexed: context must cite TopK chunks")
    assert(Seq("table", "scan", "filter")
      .exists(w => out(0).getString(1).contains(w)))
    // WARM serve: same key + same epoch token. The store pipeline —
    // including the prefix-sum enumeration, whose CONSTRUCTION runs a
    // totals job and registers the "prefixsum.local" tracked persist
    // — must never run: zero build jobs above the two serves
    // (SavedIndex's O(1) epoch hit through the by-name corpus).
    graft.io.Caches.clearAll(spark)
    val prefixBefore = graft.io.Caches.trackedCount("prefixsum.local")
    val again = RagPipeline.run(spark, corpus,
      Seq("table scan filter"), "simple", retrieval = "hybrid_indexed",
      indexKey = key, epoch = epoch).collect()
    assert(graft.io.Caches.trackedCount("prefixsum.local") == prefixBefore,
      "warm hybrid_indexed serve must not construct the store enumeration")
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "warm serve must be value-identical to the building call")
    // a fresh key (fresh build over the same corpus) agrees too —
    // the saved-serve composition is build-deterministic
    val rebuilt = RagPipeline.run(spark, corpus,
      Seq("table scan filter"), "simple", retrieval = "hybrid_indexed",
      indexKey = key + "-rebuild", epoch = Some("spec-v1-rebuild")).collect()
    assert(out.map(_.toSeq).toSeq == rebuilt.map(_.toSeq).toSeq)
    // the mode is saved-serve by definition: no indexKey raises
    val e = intercept[IllegalArgumentException] {
      RagPipeline.run(spark, corpus, Seq("x"), "simple",
        retrieval = "hybrid_indexed")
    }
    assert(e.getMessage.contains("indexKey"))
  }

  test("ensureIndexedServe: the fusion rows' shared build-once half is epoch-O(1) and key-compatible with run()") {
    val corpus = docs.limit(50)
    val key = "ragpipeline-spec-ensure-shared"
    val epoch = Some("spec-ensure-shared-v1")
    val base = RagPipeline.indexedCacheKeyBase(key, "simple",
      graft.vector.HashingEmbedder(64), RagPipeline.IndexedCells)
    // cold: builds both indexes through the shared half
    val (disk, cents, bm) = RagPipeline.ensureIndexedServe(spark,
      RagPipeline.buildStore(corpus, "simple"), base, epoch)
    assert(cents.length == RagPipeline.IndexedCells)
    assert(disk.columns.contains("embedding") && disk.columns.contains("text"),
      "disk corpus must carry the columns the brute truth leg reads")
    // warm: zero store constructions (the r19-verdict-#2 contract the
    // fusion eval rows now rely on — their denominators must price
    // the serve path, not a per-run refit)
    graft.io.Caches.clearAll(spark)
    val prefixBefore = graft.io.Caches.trackedCount("prefixsum.local")
    val (disk2, cents2, _) = RagPipeline.ensureIndexedServe(spark,
      RagPipeline.buildStore(corpus, "simple"), base, epoch)
    assert(graft.io.Caches.trackedCount("prefixsum.local") == prefixBefore,
      "warm ensureIndexedServe must not construct the store enumeration")
    assert(cents2.toSeq.map(_.toSeq) == cents.toSeq.map(_.toSeq))
    // and run("hybrid_indexed") with the same identity tuple hits the
    // SAME saved pair — the memoized frames come back reference-equal
    assert(disk2.asInstanceOf[AnyRef].eq(disk.asInstanceOf[AnyRef]),
      "same key + epoch must serve the memoized loadIndex frames")
    val viaRun = RagPipeline.run(spark, corpus, Seq("table scan filter"),
      "simple", retrieval = "hybrid_indexed", indexKey = key,
      epoch = epoch).collect()
    assert(viaRun.length == 1,
      "run() over the shared key must serve (not rebuild) and answer")
    // BM25 serve from the shared half matches an inline build
    val qt = { import spark.implicits._
      Seq((0, "table scan filter")).toDF("query_id", "qtext") }
    val served = graft.text.Bm25.topKIndexed(bm, qt, 3).collect()
    val inline = graft.text.Bm25.topK(
      disk.select(org.apache.spark.sql.functions.col("vec_id").as("doc_id"),
        org.apache.spark.sql.functions.col("text")), qt, 3).collect()
    assert(served.map(_.toSeq).toSeq == inline.map(_.toSeq).toSeq)
  }

  test("run: signlsh retrieval agrees with brute on an exact-chunk query") {
    val corpus = docs.limit(50)
    // query = an exact chunk text: its embedding equals the stored
    // chunk's, so every sign-LSH band key collides and the candidate
    // set must contain the chunk — rank-1 is then the cosine-1 chunk,
    // exactly what brute retrieval returns
    // a UNIQUE chunk text: the fixture corpus contains near-duplicate
    // documents, and a duplicated chunk would make rank-1 a cosine-1
    // tie that brute and signlsh break by different keys
    val store = RagPipeline.buildStore(corpus, "simple")
    val chunkText = store.groupBy(col("text")).count()
      .filter(col("count") === 1)
      .orderBy(col("text")).select(col("text")).head().getString(0)
    val brute = RagPipeline.run(spark, corpus, Seq(chunkText), "simple",
      retrieval = "brute").collect()
    val lsh = RagPipeline.run(spark, corpus, Seq(chunkText), "simple",
      retrieval = "signlsh").collect()
    assert(lsh.length == 1)
    val bruteTop = brute(0).getString(1).split("\n\n").head
    val cited = lsh(0).getString(1).split("\n\n")
    assert(cited.nonEmpty && cited.head == bruteTop,
      "signlsh rank-1 must be the exact-match chunk brute retrieval finds")
    // banded ANN may cite fewer than TopK on sparse collisions, never more
    assert(cited.length <= RagPipeline.TopK)
  }

  test("run: ivf and lsh retrieval produce a full cited context; unknown retrieval raises") {
    for (retrieval <- Seq("ivf", "lsh")) {
      val out = RagPipeline.run(spark, docs.limit(50),
        Seq("table scan filter"), "simple", retrieval = retrieval).collect()
      assert(out.length == 1, s"$retrieval: one context row per query")
      assert(out(0).getString(1).split("\n\n").length == RagPipeline.TopK,
        s"$retrieval: context must cite TopK chunks")
    }
    val e = intercept[IllegalArgumentException] {
      RagPipeline.run(spark, docs.limit(5), Seq("x"), "simple",
        retrieval = "bogus-ann")
    }
    assert(e.getMessage.contains("bogus-ann"))
  }
}
