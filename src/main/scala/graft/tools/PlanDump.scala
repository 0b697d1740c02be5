package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Writes each named query's `.explain("formatted")` text to its own
  * file — the per-query before/after plan evidence the optimization
  * rounds commit under plans/rNN/. Usage:
  *
  *   sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]"
  *
  * e.g. `runMain graft.tools.PlanDump /root/testdata/sf0.01 plans/r20
  * before q_dup_containment,q_corpus_filter` writes
  * plans/r20/q_dup_containment_before.txt etc. With no query list it
  * dumps the whole catalog. Plans are captured via
  * `queryExecution.explainString(FormattedMode)` — identical text to
  * `.explain("formatted")` but returned instead of printed.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else "plans/r20"
    val suffix = if (args.length > 2) args(2) else "before"
    val names: Seq[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val text = df.queryExecution.explainString(FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), text)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt (${text.length} chars)")
      graft.io.Caches.clearAll(spark)
    }
    spark.stop()
  }
}
