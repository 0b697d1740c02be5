package graft.rel

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class RelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("yearQuarter: month boundaries (Backend/api.py:22-26 semantics)") {
    val got = Seq("2024-03-31", "2024-04-01", "2024-12-31", "2009-01-01")
      .toDF("d")
      .select(Rel.yearQuarter(to_date(col("d"))).as("yq"))
      .as[String].collect().toSeq
    assert(got == Seq("2024q1", "2024q2", "2024q4", "2009q1"))
  }

  test("validDate: regex + year-range gate (2009..2024)") {
    val got = Seq("2024-01-31", "2008-12-31", "2025-01-01", "2024-1-31", "x")
      .toDF("d").select(Rel.validDate(col("d")).as("v"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, false, false, false, false))
  }

  test("filters compose with AND semantics") {
    val df = Seq((1, 10.0, "a"), (2, 20.0, "a"), (3, 30.0, "b"))
      .toDF("id", "v", "tag")
    val out = Rel.applyFilters(df,
      Seq(Rel.Eq("tag", "a"), Rel.NumBetween("v", 5, 15)))
      .select("id").as[Int].collect().toSeq
    assert(out == Seq(1))
  }

  test("histogram: numpy semantics — equal width, last bin closed") {
    val df = (0 to 100).map(_.toDouble).toDF("x")
    val h = Rel.histogram(df, "x").collect()
    assert(h.length == 10)
    // 0..9 in bin 0 (width 10), value 100 lands in last bin (closed)
    assert(h.head.getAs[Long]("count") == 10)
    assert(h.last.getAs[Long]("count") == 11)
    assert(h.map(_.getAs[Long]("count")).sum == 101)
  }

  test("histogram degenerate case: all values equal → single bucket") {
    val h = Rel.histogram(Seq(5.0, 5.0, 5.0).toDF("x"), "x").collect()
    assert(h.length == 1)
    assert(h.head.getAs[Int]("bucket") == 0)
    assert(h.head.getAs[Long]("count") == 3)
  }

  test("quarterOf prefers link text, falls back to URL path") {
    val df = Seq(
      ("Q3 2024 10-Q", "https://x/other/file.pdf"),
      ("Annual Report", "https://x/q2/file.pdf"),
      ("Annual Report", "https://x/other/file.pdf"))
      .toDF("text", "href")
    val got = df.select(Rel.quarterOf(col("text"), col("href")).as("q"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("Q3"), Some("Q2"), None))
  }

  test("page is deterministic limit/offset") {
    val df = (1 to 300).toDF("id")
    val out = Rel.page(df, Seq(col("id")), limit = 10, offset = 20)
      .as[Int].collect().toSeq
    assert(out == (21 to 30))
  }
}
