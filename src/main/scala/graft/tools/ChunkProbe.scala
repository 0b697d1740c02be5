package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage-attribution probe for q_chunk_recursive_split's
  * giant path (r14: the split row measured SLOWER than the unsplit
  * baseline at 50 MB — find the serial stage). */
object ChunkProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mb = args.headOption.map(_.toInt).getOrElse(50)
    val dir = ScaleStress.skewDir(spark, "/root/testdata/sf0.1", mb,
      giantOnly = true)
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        graft.io.Caches.clearAll(spark)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[chunkprobe] $tag%-26s first=${ts.head}%.2f min=${ts.min}%.2f")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val derived = docs
      .groupBy((col("doc_id") % 25).as("gid"))
      .agg(concat_ws("\n\n",
        transform(sort_array(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text"))).as("text"))
      .select(col("gid").as("doc_id"),
        concat(lit("group-"), col("gid")).as("source"),
        col("text"), length(col("text")).cast("long").as("n_chars"))
    time("derived-build")(derived.select(col("doc_id"), col("n_chars")))
    val cached = derived.cache()
    cached.count()
    val ck = graft.text.chunk.RecursiveChunker()
    time("parts-fanout")(graft.text.chunk.DocSplit
      .parts(cached, 1 << 20)
      .select(col("doc_id"), col("part_index"), length(col("text"))))
    val p = graft.text.chunk.DocSplit.parts(cached, 1 << 20)
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("doc_id"), col("part_index"))
      .select((shiftleft(col("doc_id"), 31) + col("start")).as("doc_id"),
        col("source"), col("text"), col("n_chars"))
    time("parts+chunk")(ck.chunk(p))
    time("chunkParts-full")(graft.text.chunk.DocSplit
      .chunkParts(cached, ck, 1 << 20))
    time("unsplit-chunk")(ck.chunk(cached))
    time("q_recursive_split-e2e")(
      graft.SparkEntry.queries("q_chunk_recursive_split")(spark, dir))
    time("q_recursive-e2e")(
      graft.SparkEntry.queries("q_chunk_recursive")(spark, dir))
    spark.stop()
  }
}
