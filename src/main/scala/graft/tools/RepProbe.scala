package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage-attribution probe for q_repetition's giant branch
  * (r14: VERDICT asked whether the 8.26× row-skew ratio is the gram
  * aggregate, the part fan-out, or inherent kernel work). Times each
  * prefix of the giant plan on a 50 MB giant-only corpus. */
object RepProbe {
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
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[repprobe] $tag%-28s first=${ts.head}%.2f min=${ts.min}%.2f")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pieceChars = 1 << 19
    val pieceUdf = udf((text: String) =>
      graft.text.Tok.lookaheadPieces(text, pieceChars, 3))
    val nsp = spark.sessionState.conf.numShufflePartitions
    def pieces = docs
      .select(col("doc_id"),
        posexplode(pieceUdf(col("text"))).as(Seq("p", "pc")))
      .repartition(nsp, col("doc_id"), col("p"))
    time("cut+shuffle")(pieces.select(col("doc_id"), length(col("pc.piece"))))
    def withTok = pieces
      .select(col("doc_id"),
        graft.text.Tok.tokens(col("pc.piece")).as("ts"),
        col("pc.look").as("look"))
      .select(col("doc_id"),
        concat(col("ts"), col("look")).as("pts"),
        size(col("ts")).as("valid"))
    time("+tokenize")(withTok.select(col("doc_id"), col("valid")))
    def gramRows = withTok
      .select(col("doc_id"),
        explode_outer(graft.text.StrExpr.partGramCounts(
          col("pts"), col("valid"))).as("g"))
      .select(col("doc_id"), coalesce(col("g.n"), lit(0)).as("n"),
        coalesce(col("g.h1"), lit(0L)).as("h1"),
        coalesce(col("g.h2"), lit(0L)).as("h2"),
        coalesce(col("g.cnt"), lit(0L)).as("cnt"))
    val perN = gramRows
      .groupBy(col("doc_id"), col("n"), col("h1"), col("h2"))
      .agg(sum(col("cnt")).as("c"))
    time("+grams+groupBys")(perN.groupBy(col("doc_id"), col("n"))
      .agg(sum(col("c")).as("t"), count(lit(1)).as("d"),
        coalesce(sum(when(col("c") === 1, lit(1L))), lit(0L)).as("sg"),
        max(col("c")).as("m")))
    time("full q_repetition")(
      graft.SparkEntry.queries("q_repetition")(spark, dir))
    graft.io.Caches.clearAll(spark)
    time("full q_repetition (2)")(
      graft.SparkEntry.queries("q_repetition")(spark, dir))
    spark.stop()
  }
}
