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

/** A REAL-model-shaped [[BatchModel]]: bag-of-tokens features through
  * a fixed linear projection + bias, L2-normalized — the exact
  * computational shape of a sentence-embedding head, exercised with
  * the production integration pattern: the weight matrix (standing in
  * for an ONNX session / DJL predictor) lives in a `@transient lazy
  * val` rebuilt on each executor from the lightweight seed, so the
  * driver never ships the heavyweight handle. Fully deterministic
  * (seeded), so a driver-side reference can replay it exactly. */
case class LinearProjectionModel(dim: Int = 8, featDim: Int = 32,
    seed: Long = 42L) extends BatchModel {

  // stands in for "load model.onnx": per-executor materialization
  @transient private lazy val session: (Array[Array[Float]], Array[Float]) =
    LinearProjectionModel.weights(dim, featDim, seed)

  def embedBatch(texts: Array[String]): Array[Array[Float]] = {
    val (w, b) = session
    texts.map { t =>
      val f = LinearProjectionModel.features(t, featDim)
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        var acc = b(j)
        var i = 0
        while (i < featDim) { acc += f(i) * w(i)(j); i += 1 }
        out(j) = acc
        j += 1
      }
      val norm = math.sqrt(out.map(x => x.toDouble * x).sum)
      if (norm > 0) out.map(x => (x / norm).toFloat) else out
    }
  }
}

object LinearProjectionModel {
  /** Deterministic pseudo-weights — the test's "model file". */
  def weights(dim: Int, featDim: Int,
      seed: Long): (Array[Array[Float]], Array[Float]) = {
    val rnd = new java.util.Random(seed)
    (Array.fill(featDim)(Array.fill(dim)(rnd.nextFloat() * 2 - 1)),
      Array.fill(dim)(rnd.nextFloat() * 0.1f))
  }

  /** Whitespace bag-of-tokens hashed into `featDim` counts. */
  def features(text: String, featDim: Int): Array[Float] = {
    val f = new Array[Float](featDim)
    if (text != null) text.split("\\s+").filter(_.nonEmpty).foreach { t =>
      f(java.lang.Math.floorMod(t.hashCode, featDim)) += 1f
    }
    f
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

  test("linear-projection model: batched == per-row == driver-side oracle") {
    val model = LinearProjectionModel(dim = 8, featDim = 32, seed = 42L)
    // independent oracle: replay the matmul in plain driver Scala
    // from the same seeded weights, outside any Spark machinery
    def oracle(text: String): Seq[Float] = {
      val (w, b) = LinearProjectionModel.weights(8, 32, 42L)
      val f = LinearProjectionModel.features(text, 32)
      // same float association as the model: bias first, ascending i
      val raw = (0 until 8).map { j =>
        var acc = b(j)
        (0 until 32).foreach(i => acc += f(i) * w(i)(j))
        acc
      }
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum)
      raw.map(x => (x / n).toFloat)
    }
    val sample = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (bs <- Seq(3, 50)) {
      val viaBatch = BatchedEmbedder(model, batchSize = bs)
        .embed(docs).select("doc_id", "embedding")
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      viaBatch.foreach { case (id, v) =>
        assert(v == oracle(sample(id)), s"doc $id diverged at batchSize=$bs")
        assert(v == model.embedBatch(Array(sample(id)))(0).toSeq) // per-row
      }
    }
  }

  test("linear-projection model drives buildStore + retrieval end to end") {
    val model = LinearProjectionModel(dim = 8, featDim = 32, seed = 7L)
    val base = docs.withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val store = graft.pipeline.RagPipeline
      .buildStore(base, "simple", BatchedEmbedder(model, batchSize = 16))
    val rows = store.select("id", "text", "embedding").collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[Float](2))).toSeq
    assert(rows.nonEmpty)
    // every stored vector is the model's own output for its chunk text
    rows.foreach { case (id, text, v) =>
      assert(v == model.embedBatch(Array(text))(0).toSeq,
        s"store row $id does not carry the model's vector")
    }
    // retrieval sanity: cosine top-1 for a stored chunk's own text is
    // that chunk (unit vectors — dot == cosine; ties impossible on
    // the fixture because texts differ)
    val (qid, qtext, qv) = rows.head
    val best = rows.maxBy { case (_, _, v) =>
      v.zip(qv).map { case (a, b) => a.toDouble * b }.sum
    }
    assert(best._1 == qid)
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
