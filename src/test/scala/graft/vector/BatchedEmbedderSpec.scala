package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Instrumented model: records every batch's size in an accumulator
  * (top-level so the closure captures no test-suite state). */
case class CountingBatchModel(dim: Int,
    sizes: org.apache.spark.util.CollectionAccumulator[Int]) extends BatchModel {
  private val inner = HashingEmbedder(dim)
  def embedBatch(texts: Array[String]): Array[Array[Float]] = {
    sizes.add(texts.length)
    texts.map(inner.embedOne)
  }
}

/** Model that refuses nulls — proves the adapter's null handling. */
case class StrictBatchModel(dim: Int) extends BatchModel {
  private val inner = HashingEmbedder(dim)
  def embedBatch(texts: Array[String]): Array[Array[Float]] = {
    require(!texts.contains(null), "model must never see null")
    texts.map(inner.embedOne)
  }
}

/** Pins the batched-inference adapter ([[BatchedEmbedder]]) — the
  * template a real embedding model plugs into. */
class BatchedEmbedderSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text")).limit(100)

  test("batched adapter produces exactly the per-row embedder's vectors") {
    val viaBatch = BatchedEmbedder(HashingBatchModel(16), batchSize = 7)
      .embed(docs).select("doc_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val viaRow = HashingEmbedder(16)
      .embed(docs).select("doc_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(viaBatch == viaRow)
  }

  test("model sees batches of at most batchSize, and far fewer calls than rows") {
    val sizes = spark.sparkContext.collectionAccumulator[Int]("batch_sizes")
    val n = BatchedEmbedder(CountingBatchModel(8, sizes), batchSize = 32)
      .embed(docs.repartition(2)).count()
    assert(n == 100)
    val observed = sizes.value
    assert(!observed.isEmpty, "model was never called")
    observed.forEach(s => assert(s <= 32, s"batch of $s exceeds batchSize"))
    // 100 rows / 32 per batch over 2 partitions: at most 2 ragged tails
    assert(observed.size <= 6, s"too many model calls: ${observed.size}")
  }

  test("null texts become zero vectors and never reach the model") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, null.asInstanceOf[String]), (3L, "x"))
      .toDF("doc_id", "text")
    val got = BatchedEmbedder(StrictBatchModel(4), batchSize = 2).embed(df)
      .select("doc_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(2L) == Seq(0f, 0f, 0f, 0f))
    assert(got(1L) == HashingEmbedder(4).embedOne("hello world").toSeq)
  }

  test("pluggable end to end: buildStore with the batched adapter equals the default") {
    val base = docs.withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val a = graft.pipeline.RagPipeline
      .buildStore(base, "simple", BatchedEmbedder(HashingBatchModel(64)))
      .select("id", "embedding")
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val b = graft.pipeline.RagPipeline
      .buildStore(base, "simple", HashingEmbedder(64))
      .select("id", "embedding")
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
  }
}
