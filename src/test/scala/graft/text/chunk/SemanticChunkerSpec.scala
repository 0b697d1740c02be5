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

  test("threshold search produces fewer, larger chunks than the min-split") {
    val pieces = RecursiveChunker(chunkSize = 50, overlap = 0).chunk(docs).count()
    val merged = chunks.count()
    assert(merged <= pieces)
    assert(merged > 0)
  }
}
