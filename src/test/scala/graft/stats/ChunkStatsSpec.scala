package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class ChunkStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // crafted interval sets: disjoint, overlapping, nested, identical
  private val chunks = Seq(
    // doc 1: two disjoint chunks
    (1L, 0, 0, 10), (1L, 1, 20, 30),
    // doc 2: overlapping pair
    (2L, 0, 0, 10), (2L, 1, 5, 15),
    // doc 3: nested + identical
    (3L, 0, 0, 20), (3L, 1, 5, 10), (3L, 2, 5, 10))
    .toDF("doc_id", "chunk_index", "start", "end")

  test("boundary sweep: active counts per segment (W4)") {
    val seg = ChunkStats.boundarySweep(chunks)
      .orderBy("doc_id", "seg_start")
      .select("doc_id", "seg_start", "seg_end", "active", "is_overlap")
      .as[(Long, Int, Int, Int, Boolean)].collect().toSeq
    // doc1: [0,10) active 1; [10,20) active 0 (dropped); [20,30) active 1
    assert(seg.filter(_._1 == 1L) == Seq((1L, 0, 10, 1, false), (1L, 20, 30, 1, false)))
    // doc2: [0,5) 1; [5,10) 2 overlap; [10,15) 1
    assert(seg.filter(_._1 == 2L) ==
      Seq((2L, 0, 5, 1, false), (2L, 5, 10, 2, true), (2L, 10, 15, 1, false)))
    // doc3: [0,5) 1; [5,10) 3 overlap; [10,20) 1
    assert(seg.filter(_._1 == 3L) ==
      Seq((3L, 0, 5, 1, false), (3L, 5, 10, 3, true), (3L, 10, 20, 1, false)))
  }

  test("overlap pairs: only truly intersecting pairs (J4)") {
    val pairs = ChunkStats.overlapPairs(chunks)
      .select("doc_id", "i", "j").as[(Long, Int, Int)].collect().toSet
    assert(pairs == Set((2L, 0, 1), (3L, 0, 1), (3L, 0, 2), (3L, 1, 2)))
  }

  test("adjacent overlap via lead (W2)") {
    val adj = ChunkStats.adjacentOverlap(chunks)
      .select("doc_id", "chunk_index", "overlap_len")
      .as[(Long, Int, Int)].collect().toSet
    assert(adj.contains((1L, 0, 0)))  // disjoint → 0
    assert(adj.contains((2L, 0, 5)))  // [0,10)∩[5,15) → 5
  }

  test("chunkJson emits the reference sink shape (S10)") {
    val withMeta = chunks
      .withColumn("text", lit("x"))
      .withColumn("char_length", col("end") - col("start"))
      .withColumn("token_length", lit(1))
      .withColumn("strategy", lit("simple"))
    val row = ChunkStats.chunkJson(withMeta).head()
    assert(row.getAs[String]("strategy") == "simple")
    assert(row.getAs[Long]("chunk_count") == 7)
    assert(row.getAs[String]("chunks").startsWith("[{"))
  }

  test("property: sweep segment lengths sum to the interval-union length") {
    // SURVEY §5.2 ScalaCheck property for W4, deterministic sweep of
    // random-ish interval sets (fixed seed)
    val rnd = new scala.util.Random(42)
    val data = for {
      doc <- 0 until 30
      i <- 0 until (1 + rnd.nextInt(8))
    } yield {
      val s = rnd.nextInt(500)
      (doc.toLong, i, s, s + 1 + rnd.nextInt(120))
    }
    val df = data.toDF("doc_id", "chunk_index", "start", "end")
    val segs = ChunkStats.boundarySweep(df)
      .select("doc_id", "seg_start", "seg_end")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._3 - t._2).sum).toMap
    // brute-force union length per doc
    val expected = data.groupBy(_._1).view.mapValues { ivs =>
      val covered = scala.collection.mutable.BitSet()
      ivs.foreach { case (_, _, s, e) => (s until e).foreach(covered += _) }
      covered.size
    }.toMap
    assert(segs == expected)
  }

  test("chunkJson golden file: exact JSON for a fixed document") {
    // golden test per SURVEY §5.2 item 4 — shape fixed by
    // chunk_visualizer.py:29-49
    val one = Seq((9L, 0, 0, 5, "hello", 5, 1, "simple"),
      (9L, 1, 3, 8, "lo wo", 5, 2, "simple"))
      .toDF("doc_id", "chunk_index", "start", "end", "text",
        "char_length", "token_length", "strategy")
    val got = ChunkStats.chunkJson(one).head().getAs[String]("chunks")
    val expected =
      """[{"doc_id":9,"id":0,"text":"hello","char_length":5,"token_length":1},""" +
        """{"doc_id":9,"id":1,"text":"lo wo","char_length":5,"token_length":2}]"""
    assert(got == expected)
  }

  test("chunkJson escapes backslash, quote, newline, cr, tab as valid JSON") {
    val tricky = "a\\b\"c\nd\re\tf"
    val one = Seq((1L, 0, 0, 11, tricky, 11, 1, "simple"))
      .toDF("doc_id", "chunk_index", "start", "end", "text",
        "char_length", "token_length", "strategy")
    val got = ChunkStats.chunkJson(one).head().getAs[String]("chunks")
    assert(got.contains("""a\\b\"c\nd\re\tf"""))
    // and the canonical string parses back to the original text
    val parsed = spark.range(1).select(
      from_json(lit(got),
        org.apache.spark.sql.types.DataTypes.createArrayType(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType))))).as("j"))
      .selectExpr("j[0].text").head().getString(0)
    assert(parsed == tricky)
  }
}
