package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension, BASELINE.json):
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata structs. The actual codec libraries are not in this
  * container, so the decode kernel is a clearly-marked deterministic
  * stub — but the Spark-side contract (schema, batch iteration,
  * partition-parallel execution, metadata extraction) is real and
  * tested, and swapping the stub for a real decoder changes nothing
  * upstream.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_length", IntegerType, nullable = false),
    StructField("checksum", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** Build an assets table: opaque binary payload + metadata struct.
    * (Fixture stand-in: payload = UTF-8 bytes of document text; in
    * production this is the `binaryFile` source or a parquet binary
    * column.) */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image/png").as("content_type"),
        col("source").as("origin"),
        col("n_chars").cast("int").as("declared_size")).as("meta"))

  /** STUB decode kernel — stands in for an image/audio codec.
    * Deterministic fake: "dimensions" derived from byte length,
    * "feature" = 8 coarse byte-histogram buckets, L1-normalized.
    * Replace the body with a real codec (e.g. javax.imageio) without
    * touching the operator contract. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val width = math.max(1, math.sqrt(n.toDouble).toInt)
    val height = math.max(1, n / math.max(width, 1))
    val hist = new Array[Float](8)
    payload.foreach(b => hist((b & 0xff) / 32) += 1f)
    val s = hist.sum
    (width, height, if (s > 0) hist.map(_ / s) else hist)
  }

  /** One decoded asset row (the mapPartitions element type). */
  case class AssetFeature(asset_id: Long, media_type: String,
      byte_length: Int, checksum: String, width: Int, height: Int,
      feature: Array[Float])

  /** Feature extraction over binary payloads as `mapPartitions` —
    * the JVM analog of a `mapInPandas` batch UDF: the codec (here the
    * stub) is instantiated ONCE per partition and streamed over the
    * partition's rows; no shuffle, fan-in stays on the executor.
    * Swapping `decodeStub` for a real library keeps this shape. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("asset_id"), col("meta.content_type").as("media_type"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec state lives here (a real decoder would
        // allocate its native context once per partition)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, mediaType, payload) =>
          md.reset()
          val checksum = md.digest(payload).map(b => f"$b%02x").mkString
          val (w, h, f) = decodeStub(payload)
          AssetFeature(id, mediaType, payload.length, checksum, w, h, f)
        }
      }
      .toDF()
  }

  /** STUB resize kernel — stands in for an image resampler. Maps the
    * payload onto a w×h byte grid by nearest-neighbor index sampling
    * (deterministic; a real codec would decode → resample → encode).
    * Exercises the binary→binary transform contract. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = payload.length
    if (n == 0) return Array.emptyByteArray
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = payload((i.toLong * n / out.length).toInt)
      i += 1
    }
    out
  }

  /** Resize assets to target dimensions; payload replaced, metadata
    * struct updated — per-row binary transform, no shuffle. */
  def resize(assets: DataFrame, w: Int, h: Int): DataFrame = {
    val f = udf((p: Array[Byte]) => resizeStub(p, w, h))
    assets
      .withColumn("payload", f(col("payload")))
      .withColumn("meta", struct(
        col("meta.content_type"), col("meta.origin"),
        lit(w * h).as("declared_size")))
  }

  /** Frame-sampling stub for video-like payloads: emit every
    * `stride`-th 16-byte "frame" window with its offset — exercises
    * the one-row→many generator shape on binary columns. */
  def sampleFrames(assets: DataFrame, stride: Int = 64): DataFrame =
    assets
      .withColumn("frame_off",
        explode(sequence(lit(0), greatest(length(col("payload")) - 1, lit(0)),
          lit(stride))))
      .select(col("asset_id"), col("frame_off"),
        col("payload").substr(col("frame_off") + lit(1), lit(16)).as("frame"))
}
