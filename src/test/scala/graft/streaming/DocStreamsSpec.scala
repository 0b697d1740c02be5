package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.io.Tables
import graft.textan.TextAnalysis

class DocStreamsSpec extends AnyFunSuite with SparkTestBase {

  test("streaming content dedup keeps exactly the batch-distinct fingerprint set") {
    // corpus with guaranteed duplicates: the fixture documents twice
    // (fresh doc_ids for the copies, same text)
    val docs = Tables.documents(spark, sf)
    val doubled = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + lit(1000000L)))
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup-stream").toString
    doubled.write.mode("overwrite").parquet(tmp)

    val query = DocStreams.dedupDocumentStream(spark, tmp)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_docs_out").start()
    try {
      query.processAllAvailable()
      val got = spark.table("dedup_docs_out")
      val gotFps = got.select("fingerprint").collect().map(_.getString(0)).toSeq
      val batchFps = docs
        .select(TextAnalysis.contentFingerprint(col("text")).as("fp"))
        .distinct().collect().map(_.getString(0)).toSeq
      // one survivor per distinct content, same fingerprint set as batch
      assert(gotFps.length == gotFps.distinct.length)
      assert(gotFps.toSet == batchFps.toSet)
    } finally query.stop()
  }

  test("watermarked event dedup drops same-id re-deliveries") {
    val events = Tables.events(spark, sf).limit(500)
    val doubled = events.unionByName(events)
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup-events").toString
    doubled.write.mode("overwrite").parquet(tmp)

    val query = DocStreams.dedupEventStream(spark, tmp)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_events_out").start()
    try {
      query.processAllAvailable()
      val got = spark.table("dedup_events_out")
      val distinctIds = events.select("event_id").distinct().count()
      assert(got.count() == distinctIds)
      assert(got.select("event_id").distinct().count() == distinctIds)
    } finally query.stop()
  }
}
