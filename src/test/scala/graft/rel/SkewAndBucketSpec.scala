package graft.rel

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class SkewAndBucketSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key") {
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "tag")
    val plain = big.join(small, "k").groupBy("k", "tag").count()
      .orderBy("k").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(big, small, "k", saltSource = col("v"))
      .groupBy("k", "tag").count().orderBy("k").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("heavyHitters surfaces the skewed key first") {
    val df = (1 to 1000).map(i => if (i <= 900) 42L else i.toLong).toDF("k")
    val top = Skew.heavyHitters(df, "k", 1).head()
    assert(top.getLong(0) == 42L && top.getLong(1) == 900L)
  }

  test("bucketed tables join without a shuffle exchange (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previous JVM's metastore is gone but its warehouse dirs may
    // remain; CTAS refuses to reuse an existing location
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_quantity"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      // correctness unchanged vs the unbucketed join
      val expected = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
