package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources for the engine's fixture tables (SURVEY.md §2.1 S5–S7).
  *
  * The reference reads whole markdown files / Snowflake SQL row sets
  * (`/root/reference/Chunking_Strats/kamredt_chunking.py:41-42`,
  * `/root/reference/Frontend/app.py:113-114`); here every table is a
  * parquet directory so Catalyst gets footer schemas, column pruning
  * and predicate pushdown for free. At 100 TB the same call reads a
  * partitioned table — nothing here assumes single-file input.
  */
object Tables {
  val tpch: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val rag: Seq[String] = Seq("documents", "embeddings")
  val all: Seq[String] = tpch ++ rag :+ "events"

  /** Compute-heavy narrow tables are hash-repartitioned on their id
    * right after the scan. Two reasons, both scale-motivated:
    * (a) a single-file / single-row-group fixture otherwise yields ONE
    *     scan task, so every per-row md5/regex/vector expression runs
    *     serially no matter how many cores exist — the repartition is
    *     what a many-file 100 TB table gives naturally;
    * (b) hash partitioning on the id pre-clusters the table for the
    *     dominant downstream shape (`groupBy(doc_id)` /
    *     `Window.partitionBy(doc_id)`), so those aggregations reuse
    *     this exchange instead of adding their own.
    * Wide TPC-H fact tables are NOT spread: their queries start with
    * pushed-down scans + partial aggregation, where an up-front
    * shuffle of raw rows would cost more than it saves. */
  private val spreadKey: Map[String, String] =
    Map("documents" -> "doc_id", "embeddings" -> "vec_id")

  private def spread(df: DataFrame, key: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(p, org.apache.spark.sql.functions.col(key))
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    spreadKey.get(name).fold(raw)(spread(raw, _))
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings")

  /** The fixture `events.ts` is parquet TIMESTAMP(NANOS), which
    * Spark 4 refuses by default. Read it as nanos-since-epoch LONG
    * (legacy conf) and convert to a micros TimestampType with integer
    * `div` (never double division — ns epoch values exceed double's
    * exact integer range). The µs floor matches what any µs engine
    * sees; oracle-checked queries additionally never emit raw `ts`. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }

  /** Whole-file text source (reference S5: one file → one string row). */
  def wholeText(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)

  /** Binary-file source (reference S2 landing dir: PDFs/images as bytes). */
  def binaryFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)

  /** Tab-delimited text source with header (reference S4: the SEC
    * financial-statement `.txt` members extracted from ZIPs,
    * `testing_airflow_sec_pipeline.py:195,216`). */
  def tabDelimited(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true")
      .option("inferSchema", "true").csv(path)

  /** Register every fixture table as a temp view so `spark.sql` works
    * (replaces the reference's INFORMATION_SCHEMA surface, S7/S8).
    * `events` goes through its normalizing reader. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
