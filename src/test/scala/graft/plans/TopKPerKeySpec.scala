package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class TopKPerKeySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  private def windowed(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("operator output equals window row_number form (exact, total order)") {
    for (k <- Seq(1, 3, 7)) {
      val custom = TopKPerKey(orders, Seq(col("o_custkey")),
        Seq(desc("o_totalprice"), col("o_orderkey")), k)
        .select("o_custkey", "o_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = windowed(k)
        .select("o_custkey", "o_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(custom == expected, s"mismatch at k=$k")
    }
  }

  test("per-group output is emitted best-first") {
    val rows = TopKPerKey(orders, Seq(col("o_custkey")),
      Seq(desc("o_totalprice"), col("o_orderkey")), 3)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    rows.sliding(2).foreach {
      case Array((g1, v1), (g2, v2)) if g1 == g2 => assert(v1 >= v2)
      case _ =>
    }
  }

  test("plan contains the custom exec with a single clustering exchange") {
    val plan = TopKPerKey(orders, Seq(col("o_custkey")),
      Seq(desc("o_totalprice"), col("o_orderkey")), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), "no per-partition full sort:\n" + plan)
  }

  test("handles ties, k larger than group, single-row groups") {
    val df = Seq(
      (1L, 5.0, 1L), (1L, 5.0, 2L), (1L, 5.0, 3L), // ties broken by id
      (2L, 1.0, 4L),                                // single row
      (3L, 2.0, 5L), (3L, 3.0, 6L))                 // k > group size
      .toDF("g", "v", "id")
    val got = TopKPerKey(df, Seq(col("g")), Seq(desc("v"), col("id")), 2)
      .select("g", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (1L, 2L), (2L, 4L), (3L, 6L), (3L, 5L)))
  }

  test("RewriteTopKWindow rewrites filter(row_number<=k) to the heap operator") {
    import org.apache.spark.sql.graftshim.ColumnShim
    for ((pred, k) <- Seq((col("rn") <= 3, 3), (col("rn") < 4, 3), (col("rn") === 1, 1))) {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      val windowed = orders.withColumn("rn", row_number().over(w)).filter(pred)
      val analyzed = windowed.queryExecution.analyzed
      val rewritten = RewriteTopKWindow(analyzed)
      assert(rewritten.collectFirst { case p: TopKPerKeyPlan => p }.isDefined,
        s"rule must fire for $pred:\n$rewritten")
      // rewritten plan produces identical rows (incl. the rank column)
      val got = ColumnShim.ofRows(spark, rewritten)
        .select("o_orderkey", "rn").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val expected = windowed.select("o_orderkey", "rn").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == expected, s"row mismatch for $pred")
    }
  }

  test("RewriteTopKWindow leaves non-matching windows untouched") {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val runSum = orders.withColumn("s",
      sum(col("o_totalprice")).over(w)).filter(col("s") > 0)
    val analyzed = runSum.queryExecution.analyzed
    assert(RewriteTopKWindow(analyzed) == analyzed)
  }

  test("available through SparkSessionExtensions injection") {
    val ext = new graft.GraftExtensions
    // construction only — injection wiring is exercised by builder
    // sessions; here we assert the strategy object plans our node
    val planned = TopKPerKeyStrategy(
      TopKPerKeyPlan(Nil, Nil,
        3, org.apache.spark.sql.graftshim.ColumnShim.logicalPlan(orders)))
    assert(planned.nonEmpty)
    assert(ext != null)
  }
}
