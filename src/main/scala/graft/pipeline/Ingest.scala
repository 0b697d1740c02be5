package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.rel.Rel

/** The ingestion DAG re-expressed as one declarative pipeline
  * (SURVEY §3.2; reference:
  * `Airflow/dags/nvidia_quarterly_reports_pipeline.py`):
  * scrape-result links table → quarter classification (F2) →
  * supplementary-doc filter (P7) → group per quarter (A4) → pick the
  * first URL (A5) → filename normalization (F4/F5) → partitioned
  * sink (S6). XCom handoffs disappear — values stay in the plan; the
  * two Airflow tasks become two stages of one Spark job.
  *
  * The effective S3 prefix of the reference is `{base}/{year}` from
  * the *second* `upload_and_cleanup` definition (the duplicate-def
  * quirk, SURVEY §7.4 #6 — Python lets the later def shadow the
  * first); here that is the `year` partition column value.
  */
object Ingest {

  /** Classify + select one report per quarter from a links table
    * `(text, href)` — the output shape of the S1 scrape. */
  def selectQuarterReports(links: DataFrame, year: Int = 2024): DataFrame = {
    val classified = links
      .withColumn("quarter", Rel.quarterOf(col("text"), col("href")))
      .filter(col("quarter").isNotNull)
      // skip supplementary docs (P7: commentary|presentation|trend)
      .filter(!lower(col("href")).rlike("commentary|presentation|trend"))
    val w = Window.partitionBy(col("quarter")).orderBy(col("href"))
    classified
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1) // A5: first URL is "most relevant"
      .select(
        lit(year).as("year"),
        col("quarter"),
        col("href"),
        Rel.filenameFromUrl(col("href")).as("original_name"),
        concat(lower(col("quarter")), lit(".pdf")).as("file_name")) // F5
  }

  /** S6 — partitioned sink: `partitionBy(year, quarter)` replaces the
    * hand-built `{base}/{year}/{file}` key prefixes; at scale this is
    * what partition pruning reads back. */
  def land(reports: DataFrame, outDir: String): Unit =
    reports.write.mode(SaveMode.Overwrite)
      .partitionBy("year", "quarter")
      .parquet(outDir)
}
