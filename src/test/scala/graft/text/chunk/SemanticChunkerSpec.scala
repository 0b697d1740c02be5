package graft.text.chunk

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.text.Tok

class SemanticChunkerSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val chunks = SemanticChunker().chunk(docs).cache()

  test("chunks tile each document exactly: contiguous, full coverage") {
    val bad = chunks
      .withColumn("next_start",
        lead(col("start"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("chunk_index")))
      .filter(col("next_start").isNotNull && col("next_start") =!= col("end"))
      .count()
    assert(bad == 0, "semantic chunks must be contiguous (no gaps/overlaps)")
    // coverage: per-doc max(end) == n_chars and min(start) == 0
    val cov = chunks.groupBy("doc_id")
      .agg(min("start").as("s"), max("end").as("e"))
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .filter(col("s") =!= 0 || col("e") =!= col("n_chars"))
      .count()
    assert(cov == 0, "semantic chunks must cover the whole document")
  }

  test("chunk text matches offsets and token counts are consistent") {
    val sample = chunks.join(docs.select(col("doc_id"), col("text").as("doc")), "doc_id")
      .limit(200).collect()
    sample.foreach { r =>
      val text = r.getAs[String]("text")
      val doc = r.getAs[String]("doc")
      assert(text == doc.substring(r.getAs[Int]("start"), r.getAs[Int]("end")))
      assert(r.getAs[Int]("token_length") == Tok.count(text))
    }
  }

  test("DocSplit composition: identical below threshold, part-parallel above") {
    // below the threshold the small branch IS the whole corpus, so
    // even the corpus-global threshold selection sees identical
    // inputs — bit-identical output (the q_chunk_semantic routing)
    val ck = SemanticChunker(avgChunkTokens = 25, minChunkTokens = 10,
      embedder = graft.vector.LatticeEmbedder(8))
    val whole = ck.chunk(docs).orderBy("doc_id", "chunk_index").collect()
    val routed = DocSplit.chunkParts(docs, ck, maxChars = 1 << 20)
      .orderBy("doc_id", "chunk_index").collect()
    assert(whole.length == routed.length)
    whole.zip(routed).foreach { case (w, r) => assert(w == r) }

    // above it: a giant document splits, every part semantic-chunks
    // independently, offsets re-base to the parent and chunks tile
    val giantText = ("alpha beta gamma delta. epsilon zeta eta theta. " +
      "iota kappa lambda mu. ") * 120 // ~8.5 kB
    val giant = Seq((1L, "g", giantText))
      .toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = DocSplit.chunkParts(giant, ck, maxChars = 1000)
      .orderBy("chunk_index").collect()
    assert(out.length > 1)
    out.zipWithIndex.foreach { case (c, i) =>
      assert(c.getInt(2) == i)
      assert(c.getString(3) == giantText.substring(c.getInt(4), c.getInt(5)))
    }
    assert(out.head.getInt(4) == 0 && out.last.getInt(5) == giantText.length)
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getInt(5) == b.getInt(4),
        "semantic chunks must stay contiguous across parts")
      case _ =>
    }
  }

  test("threshold search produces fewer, larger chunks than the min-split") {
    val pieces = RecursiveChunker(chunkSize = 50, overlap = 0).chunk(docs).count()
    val merged = chunks.count()
    assert(merged <= pieces)
    assert(merged > 0)
  }
}
