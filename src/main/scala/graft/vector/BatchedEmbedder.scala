package graft.vector

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** The integration point for a REAL embedding model (reference:
  * SentenceTransformer `all-MiniLM-L6-v2` / OpenAI
  * `text-embedding-3-small`, `/root/reference/Chunking_Strats/
  * chromadb_rag.py:25, 31-32, 82-85`): implement ONE method that maps
  * a batch of texts to vectors — an ONNX session, a DJL predictor, a
  * REST client — and [[BatchedEmbedder]] handles the Spark side.
  *
  * Contract: `embedBatch(texts).length == texts.length`, every vector
  * has length [[dim]], and the function is DETERMINISTIC for a given
  * input (retries and speculative tasks may re-run a batch; a
  * non-deterministic model makes downstream results partition-
  * dependent). Implementations must be Serializable (constructed on
  * the driver, invoked on executors) — keep heavyweight native
  * handles in a `@transient lazy val` so each executor opens its own.
  */
trait BatchModel extends Serializable {
  def dim: Int
  def embedBatch(texts: Array[String]): Array[Array[Float]]
}

/** Batched-inference [[Embedder]] — the `mapPartitions` template the
  * reference's model-backed embedding step maps onto.
  *
  * Why not the default per-row UDF: real models amortize fixed cost
  * (tokenizer setup, GPU kernel launch, HTTP round-trip) over a
  * batch; calling them one row at a time is 10–100× slower. This
  * adapter groups each partition's rows into `batchSize` slices and
  * makes ONE model call per slice — the standard Spark inference
  * shape. No shuffle is introduced: embedding rides whatever stage
  * produces the rows, exactly like the UDF form.
  *
  * Null texts map to the zero vector WITHOUT reaching the model (the
  * [[Embedder.embed]] contract), so model code never sees nulls.
  */
case class BatchedEmbedder(model: BatchModel, batchSize: Int = 32)
    extends Embedder {
  require(batchSize > 0, "batchSize must be positive")

  def dim: Int = model.dim

  def embedOne(text: String): Array[Float] =
    if (text == null) new Array[Float](dim)
    else model.embedBatch(Array(text))(0)

  override def embed(df: DataFrame, textCol: String = "text",
      out: String = "embedding"): DataFrame = {
    val schema = df.schema.add(out, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(textCol)
    val (m, bs, d) = (model, batchSize, dim)
    df.mapPartitions { it =>
      it.grouped(bs).flatMap { rows =>
        // nulls are filled with zero vectors locally; only real texts
        // reach the model, and batch order is preserved
        val texts = rows.collect {
          case r if !r.isNullAt(idx) => r.getString(idx)
        }.toArray
        val embedded = if (texts.isEmpty) Iterator.empty else m.embedBatch(texts).iterator
        rows.map { r =>
          val v: Array[Float] =
            if (r.isNullAt(idx)) new Array[Float](d) else embedded.next()
          Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(Encoders.row(schema))
  }
}

/** Deterministic stand-in model for specs and offline runs: the
  * hashing embedder's vector function exposed through the batch
  * interface — proves the adapter plumbing (batch slicing, order
  * preservation, null handling, schema) without a model runtime in
  * the container. Swap for a real [[BatchModel]] in production. */
case class HashingBatchModel(dim: Int = 64) extends BatchModel {
  private val inner = HashingEmbedder(dim)
  def embedBatch(texts: Array[String]): Array[Array[Float]] =
    texts.map(inner.embedOne)
}
