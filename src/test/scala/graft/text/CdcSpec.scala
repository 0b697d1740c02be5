package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.text.chunk.CdcChunker

class CdcSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("blocks partition the token stream exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val blocks = CdcChunker.blocks(docs).collect()
    val tokCounts = docs
      .select(col("doc_id"), size(Tok.tokens(lower(col("text")))).as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = blocks.groupBy(_.getLong(0))
    assert(byDoc.keySet == tokCounts.keySet)
    byDoc.foreach { case (doc, bs) =>
      val sorted = bs.sortBy(_.getInt(1))
      // indexes are 0..n-1, starts are strictly increasing, lengths
      // tile the stream with no gap or overlap
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices)
      val starts = sorted.map(_.getInt(2))
      val lens = sorted.map(_.getInt(3))
      assert(starts.head == 0)
      sorted.indices.tail.foreach { i =>
        assert(starts(i) == starts(i - 1) + lens(i - 1), s"gap in doc $doc")
      }
      assert(starts.last + lens.last == tokCounts(doc))
    }
  }

  test("insertion robustness: an edit only disturbs blocks near the edit point") {
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
    // splice three tokens into the front third of every document
    val edited = base.withColumn("text",
      concat(
        substring_index(col("text"), " ", 5), lit(" zz qq vv "),
        expr("substring(text, length(substring_index(text, ' ', 5)) + 2)")))
    val b0 = CdcChunker.blocks(base)
      .select(col("doc_id"), col("block_md5")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
    val b1 = CdcChunker.blocks(edited)
      .select(col("doc_id"), col("block_md5")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap
    b0.foreach { case (doc, before) =>
      val after = b1(doc)
      // multiset intersection survives: every block except the O(1)
      // neighborhood of the splice re-emerges with an identical hash
      val shared = before.groupBy(identity).map { case (h, occ) =>
        math.min(occ.size, after.count(_ == h))
      }.sum
      assert(shared >= before.size - 3,
        s"doc $doc kept only $shared of ${before.size} blocks after a 3-token splice")
    }
  }

  test("cdc dedup conserves content: each distinct block survives exactly once") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val distinctBlocks = CdcChunker.blocks(docs)
      .select(col("block_md5")).distinct().count()
    val dedup = graft.Queries.q_cdc_dedup(spark, sf)
    val totals = dedup.agg(sum(col("n_kept")), sum(col("n_blocks"))).head()
    // kept multiset == distinct block set (no block lost, none kept twice)
    assert(totals.getLong(0) == distinctBlocks)
    assert(totals.getLong(1) >= totals.getLong(0))
  }

  test("crafted cuts: block boundaries sit exactly where the gram hash says") {
    val text = (1 to 60).map(i => s"w${i % 13}").mkString(" ")
    val blocks = CdcChunker.blocks(docsOf(1L -> text)).collect()
      .sortBy(_.getInt(1))
    val toks = text.split(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
    def cuts(p: Int): Boolean = p >= 3 && {
      val gram = s"${toks(p - 3)} ${toks(p - 2)} ${toks(p - 1)}"
      val hex = md.digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % CdcChunker.Modulus == 0
    }
    val expectedStarts = 0 +: (1 until toks.length).filter(cuts).toVector
    assert(blocks.map(_.getInt(2)).toSeq == expectedStarts)
  }
}
