package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private lazy val assets = Multimodal.assetsFromDocuments(
    spark.read.parquet(s"$sf/documents.parquet"))

  test("assets carry opaque binary payloads with typed metadata") {
    val r = assets.schema
    assert(r("payload").dataType.typeName == "binary")
    assert(r("meta").dataType.typeName == "struct")
  }

  test("feature extraction: deterministic stub features, real plumbing") {
    val f = Multimodal.extractFeatures(assets).cache()
    val row = f.orderBy("asset_id").head()
    assert(row.getAs[String]("media_type") == "image/png")
    assert(row.getAs[Int]("byte_length") > 0)
    assert(row.getAs[String]("checksum").length == 32)
    val feat: Seq[Float] = row.getSeq[Float](row.fieldIndex("feature"))
    assert(feat.length == 8)
    assert(math.abs(feat.sum - 1.0f) < 1e-3) // L1-normalized histogram
    // byte_length equals n_chars for the ASCII fixture corpus
    val mismatch = f.join(
      spark.read.parquet(s"$sf/documents.parquet"), col("asset_id") === col("doc_id"))
      .filter(col("byte_length") =!= col("n_chars")).count()
    assert(mismatch == 0)
  }

  test("resize: payloads land on the target grid, metadata updated") {
    val resized = Multimodal.resize(assets, 16, 8)
    val row = resized.select(length(col("payload")).as("n"),
      col("meta.declared_size").as("d")).head()
    assert(row.getAs[Int]("n") == 128 && row.getAs[Int]("d") == 128)
    // deterministic: same input → same bytes
    val h1 = Multimodal.resize(assets, 4, 4).select(md5(col("payload")).as("h"))
      .orderBy("h").collect().map(_.getString(0)).toSeq
    val h2 = Multimodal.resize(assets, 4, 4).select(md5(col("payload")).as("h"))
      .orderBy("h").collect().map(_.getString(0)).toSeq
    assert(h1 == h2)
  }

  test("frame sampling explodes payloads at the configured stride") {
    val frames = Multimodal.sampleFrames(assets, stride = 64)
    val perDoc = frames.groupBy("asset_id").count()
      .join(assets.select(col("asset_id"), length(col("payload")).as("n")), "asset_id")
    // expected frames = floor((n-1)/64) + 1
    val bad = perDoc.filter(col("count") =!=
      (floor((col("n") - 1) / 64) + 1).cast("long")).count()
    assert(bad == 0)
  }
}
