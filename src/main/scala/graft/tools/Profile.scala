package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the heavy bench queries. Not part of the
  * driver contract; run as
  * `sbt "runMain graft.tools.Profile <sfDir> <what>"`. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val what = if (args.length > 1) args(1) else "minhash"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.io.Tables
    import graft.dedup.Dedup
    import graft.text.Tok
    // warm-up
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    what match {
      case "micro" =>
        val docs = Tables.table(spark, sfDir, "documents")
        time("docs noop") { noop(docs) }
        time("tokens only") {
          noop(docs.select(col("doc_id"), Tok.tokens(col("text")).as("t")))
        }
        time("token explode") {
          noop(docs.select(col("doc_id"), explode(Tok.tokens(col("text"))).as("t")))
        }
        time("shingles col (no explode)") {
          noop(docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh")))
        }
        time("shingles explode") {
          noop(docs.select(col("doc_id"),
            explode(Dedup.shingles(col("text"), 3)).as("sh")))
        }
        time("shingles explode (again)") {
          noop(docs.select(col("doc_id"),
            explode(Dedup.shingles(col("text"), 3)).as("sh")))
        }
        val raw = spark.read.parquet(s"$sfDir/documents.parquet")
        time("no-spread shingles explode") {
          noop(raw.select(col("doc_id"),
            explode(Dedup.shingles(col("text"), 3)).as("sh")))
        }
      case "minhash" =>
        val docs = Tables.table(spark, sfDir, "documents")
        time("full q_minhash_candidates") {
          noop(Dedup.minhashCandidates(docs))
        }
        time("full (2nd run)") {
          noop(Dedup.minhashCandidates(docs))
        }
        val sh = docs.filter(trim(col("text")) =!= "")
          .select(col("doc_id"),
            explode(Dedup.shingles(col("text"), 3)).as("shingle"))
        time("shingle explode only") { noop(sh) }
        val minCols = (0 until 8).map(s =>
          min(md5(concat(lit(s.toString), lit("|"), col("shingle")))).as(s"h$s"))
        val sig = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
        time("signature groupBy") { noop(sig) }
        val bandKeys = (0 until 4).map(b =>
          concat((b * 2 until (b + 1) * 2).map(s => col(s"h$s")): _*))
        val banded = sig.select(col("doc_id"),
          posexplode(array(bandKeys: _*)).as(Seq("band", "band_key")))
        time("banded") { noop(banded) }
        val joined = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        time("join+distinct") { noop(joined) }
      case "semantic" =>
        val docs = Tables.table(spark, sfDir, "documents")
        time("full q_chunk_semantic") {
          noop(graft.text.chunk.SemanticChunker().chunk(docs))
        }
        time("full (2nd run)") {
          noop(graft.text.chunk.SemanticChunker().chunk(docs))
        }
      case "ivf" =>
        val emb = Tables.table(spark, sfDir, "embeddings")
        time("full q_topk_ivf") {
          noop(graft.Queries.q_topk_ivf(spark, sfDir))
        }
        time("full (2nd run)") {
          noop(graft.Queries.q_topk_ivf(spark, sfDir))
        }
      case other =>
        System.err.println(s"unknown profile target: $other")
    }
    spark.stop()
  }
}
