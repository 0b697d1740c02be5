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

  test("non-image payloads keep byte metadata and NULL image fields") {
    val f = Multimodal.extractFeatures(assets).cache()
    val row = f.orderBy("asset_id").head()
    assert(row.getAs[String]("media_type") == "image/png")
    assert(row.getAs[Int]("byte_length") > 0)
    assert(row.getAs[String]("checksum").length == 32)
    // text bytes are not a decodable image — the real codec says so
    assert(row.isNullAt(row.fieldIndex("width")))
    assert(row.isNullAt(row.fieldIndex("feature")))
    // byte_length equals n_chars for the ASCII fixture corpus
    val mismatch = f.join(
      spark.read.parquet(s"$sf/documents.parquet"), col("asset_id") === col("doc_id"))
      .filter(col("byte_length") =!= col("n_chars")).count()
    assert(mismatch == 0)
  }

  test("real PNG decode: dimensions, histogram and luminance match the pixel formula") {
    val f = Multimodal.extractFeatures(Multimodal.pngAssets(spark, 20))
      .orderBy("asset_id").collect()
    assert(f.length == 20)
    f.foreach { row =>
      val id = row.getAs[Long]("asset_id")
      val w = Multimodal.craftedWidth(id)
      val h = Multimodal.craftedHeight(id)
      assert(row.getAs[Int]("width") == w && row.getAs[Int]("height") == h)
      val hist = row.getSeq[Int](row.fieldIndex("hist"))
      assert(hist.sum == w * h, "histogram buckets must cover every pixel")
      // brute-force the formula in the test, independent of the codec
      val lums = for (x <- 0 until w; y <- 0 until h)
        yield (x * 7 + y * 13 + id * 31) % 256
      assert(row.getAs[Long]("lum_sum") == lums.sum)
      val feat = row.getSeq[Float](row.fieldIndex("feature"))
      assert(feat.length == 8 && math.abs(feat.sum - 1.0f) < 1e-3)
    }
  }

  test("decodeImage: corrupt bytes and truncated PNGs decode to None") {
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    val png = Multimodal.makePng(3L)
    assert(Multimodal.decodeImage(png).nonEmpty)
    assert(Multimodal.decodeImage(png.take(8)).isEmpty)
  }

  test("resize: real NN resample lands on the target grid and re-decodes") {
    val pngs = Multimodal.pngAssets(spark, 6)
    val resized = Multimodal.resize(pngs, 16, 8)
    val back = Multimodal.extractFeatures(resized).orderBy("asset_id").collect()
    back.foreach { row =>
      assert(row.getAs[Int]("width") == 16 && row.getAs[Int]("height") == 8)
    }
    // deterministic: same input → same bytes
    val h1 = Multimodal.resize(pngs, 4, 4).select(md5(col("payload")).as("h"))
      .orderBy("h").collect().map(_.getString(0)).toSeq
    val h2 = Multimodal.resize(pngs, 4, 4).select(md5(col("payload")).as("h"))
      .orderBy("h").collect().map(_.getString(0)).toSeq
    assert(h1 == h2)
    // NN sampling preserves exact source pixels: upscale 2x then check
    // a corner pixel equals the formula value at (0,0) for id 0
    val up = Multimodal.resizeImage(Multimodal.makePng(0L), 32, 20)
    val d = Multimodal.decodeImage(up).get
    assert(d.width == 32 && d.height == 20)
    // non-image payloads resize to null payloads
    val nulls = Multimodal.resize(assets.limit(5), 4, 4)
      .filter(col("payload").isNotNull).count()
    assert(nulls == 0)
  }

  test("real WAV decode: stats match the sample formula; bad input rejected") {
    val f = Multimodal.extractAudioFeatures(Multimodal.wavAssets(spark, 8))
      .orderBy("asset_id").collect()
    assert(f.length == 8)
    f.foreach { row =>
      val id = row.getAs[Long]("asset_id")
      val samples = Multimodal.craftedSamples(id)
      assert(row.getAs[Int]("sample_rate") == 8000)
      assert(row.getAs[Int]("n_samples") == samples.length)
      assert(row.getAs[Long]("s_sum") == samples.map(_.toLong).sum)
      assert(row.getAs[Int]("s_min") == samples.min.toInt)
      assert(row.getAs[Int]("s_max") == samples.max.toInt)
      val zc = samples.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
      assert(row.getAs[Int]("zero_cross") == zc)
    }
    // corrupt bytes and a PNG are not audio
    assert(Multimodal.decodeWav("not audio".getBytes).isEmpty)
    assert(Multimodal.decodeWav(Multimodal.makePng(1L)).isEmpty)
    // and a WAV is not an image
    assert(Multimodal.decodeImage(Multimodal.makeWav(1L)).isEmpty)
  }

  test("real multi-frame GIF decode: per-frame stats match the pixel formula") {
    val rows = Multimodal.extractVideoFrames(Multimodal.gifAssets(spark, 6))
      .orderBy("asset_id", "frame_no").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      val f = r.getAs[Int]("frame_no")
      val w = Multimodal.gifWidth(id)
      val h = Multimodal.gifHeight(id)
      assert(r.getAs[Int]("n_frames") == Multimodal.gifFrames(id))
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      val want = (for (x <- 0 until w; y <- 0 until h)
        yield (x * 7 + y * 13 + f * 31 + id * 17) % 256).sum
      assert(r.getAs[Long]("lum_sum") == want,
        s"frame $f of asset $id decoded wrong luminance")
    }
    // a GIF decodes as frames; corrupt bytes and audio do not
    assert(Multimodal.decodeFrames(Multimodal.makeGif(2L)).get.length ==
      Multimodal.gifFrames(2L))
    assert(Multimodal.decodeFrames("junk".getBytes).isEmpty)
    assert(Multimodal.decodeFrames(Multimodal.makeWav(1L)).isEmpty)
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

  test("phashNearDup: every constructed one-pixel variant pairs with its base; hamming verified") {
    import spark.implicits._
    val assets = Multimodal.pngAssetsWithNearDups(spark, 20)
    val pairs = Multimodal.phashNearDup(assets, 3)
      .as[(Long, Long, Int)].collect()
    val constructed = pairs.filter { case (a, b, _) => b - a == 1000L }
    assert(constructed.length == 20,
      s"all 20 one-pixel variants must pair with their base, got ${constructed.length}")
    // recompute hamming independently from the band keys
    val sigs = Multimodal.imageBandKeys(assets)
      .as[(Long, Seq[Int])].collect().toMap
    pairs.foreach { case (a, b, h) =>
      val want = sigs(a).zip(sigs(b))
        .map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      assert(h == want && h <= 3, s"pair ($a,$b): reported $h, recomputed $want")
    }
    // a structurally different image (different formula) must NOT pair
    // with everything: pairs are a strict subset of all id_a<id_b pairs
    val n = assets.count()
    assert(pairs.length < n * (n - 1) / 2)
  }

  test("audioNearDup: every one-sample variant pairs with its base; fingerprint exact") {
    // the variant's decoded samples ARE craftedSamplesNear — the
    // codec round-trip is lossless, so the fingerprint is computed
    // on exactly the formula the oracle replays
    val dec = Multimodal.decodeWavSamples(Multimodal.makeWavNear(7L)).get
    assert(dec.toSeq == Multimodal.craftedSamplesNear(7L).toSeq)
    // the one-sample click moves one frame energy: at most the two
    // delta bits comparing it flip
    val base = Multimodal.audioDeltaBands(Multimodal.craftedSamples(7L))
    val near = Multimodal.audioDeltaBands(Multimodal.craftedSamplesNear(7L))
    val flips = (0 until 4)
      .map(i => Integer.bitCount(base(i) ^ near(i))).sum
    assert(flips <= 2, s"click flipped $flips delta bits")

    val pairs = Multimodal
      .audioNearDup(Multimodal.wavAssetsWithNearDups(spark, 12), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    (0L until 12L).foreach { id =>
      val hit = pairs.find(p => p._1 == id && p._2 == 1000L + id)
      assert(hit.isDefined, s"planted audio pair $id missing")
      assert(hit.get._3 <= 2)
    }
  }
}
