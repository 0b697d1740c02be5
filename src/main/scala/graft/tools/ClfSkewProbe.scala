package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ClfSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val words = Vector("alpha","beta","gamma","delta","epsilon","zeta","the","of","and","data")
    def doc(mb: Int): String = {
      val sb = new StringBuilder(mb << 20)
      while (sb.length < (mb << 20)) { sb.append(words(rnd.nextInt(words.size))); sb.append(' ') }
      sb.toString
    }
    for (mb <- Seq(5, 50)) {
      val d = doc(mb)
      val df = Seq((1L, d, d.length.toLong)).toDF("doc_id", "text", "n_chars")
      for ((label, thr) <- Seq("split" -> (1L << 21), "perRow" -> Long.MaxValue)) {
        val t0 = System.nanoTime()
        graft.textan.TextAnalysis.classifierScore(df, splitChars = thr)
          .select("doc_id","n_features","score","keep")
          .write.format("noop").mode("overwrite").save()
        println(f"[clfskew] ${mb}%3d MB $label%-6s wall = ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
