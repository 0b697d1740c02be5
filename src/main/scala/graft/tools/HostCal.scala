package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftExtensions, JsonText, SparkEntry}

/** Host-speed calibration artifact (HOSTCAL.json).
  *
  * The shared VM has hour-scale speed windows where untouched kernels
  * measure 1.5–2× their committed walls even at loadavg ≈ 0 (two
  * same-HEAD full-bench runs differed 95.5 → 111.5 s on host speed
  * alone). Every end-of-round bench is therefore gated on a 3-query
  * pure-map micro-bench — but until r15 that gate lived only in
  * prose. This tool runs the micro-bench with EXACTLY the full
  * bench's methodology (same session config, warm-up, min-of-3,
  * noop sink, cache clear between runs) and emits the comparison as
  * an artifact, so any BENCH_LOCAL.json total can be normalized by
  * its neighbouring HOSTCAL.json instead of archaeology:
  *
  *   {"metric":"hostcal","host_ratio":R,
  *    "queries":{"q_token_count":{"baseline":B,"measured":M,"ratio":M/B},…},
  *    "loadavg_before":…,"loadavg_after":…,…}
  *
  * `host_ratio` is the MEDIAN per-query ratio — robust to one kernel
  * hitting a stray page-cache miss. Interpretation: ≈1 → trust the
  * bench total as engine-attributable; ≳1.2 at idle loadavg → the
  * host is in a slow window, re-run later or commit WITH this
  * artifact cited.
  *
  * The three kernels are pure map-side scans (no shuffle, no joins,
  * no saved indexes), untouched since r4 — their walls move with the
  * host, not with round-over-round engine work. */
object HostCal {

  /** Fast-host reference walls (seconds; sf0.1, local[32], min-of-3,
    * noop sink) pinned from the r13 idle artifact — commit b82dd3f
    * BENCH_LOCAL.json, loadavg_before "1.40 3.28 4.17". */
  val Baseline: Seq[(String, Double)] = Seq(
    "q_token_count" -> 0.331,
    "q_chunk_fixed" -> 0.377,
    "q_valid_dates" -> 0.529)

  private def loadavg(): String =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+").take(3).mkString(" ")
    catch { case _: Throwable => "" }

  /** The 3-kernel micro-bench against the pinned walls, on an
    * already-warm session: (name, baseline, measured, ratio) rows.
    * Shared by [[main]] and [[graft.Bench]]'s refresh guard so the
    * gate and the artifact can never disagree on methodology. */
  def measure(spark: SparkSession, sfDir: String)
      : Seq[(String, Double, Double, Double)] =
    Baseline.map { case (name, base) =>
      val fn = SparkEntry.queries(name)
      val wall = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val e = (System.nanoTime() - t0) / 1e9
        graft.io.Caches.clearAll(spark)
        e
      }.min
      (name, base, wall, wall / base)
    }

  /** Median per-query ratio — robust to one stray page-cache miss. */
  def hostRatioOf(rows: Seq[(String, Double, Double, Double)]): Double =
    rows.map(_._4).sorted.apply(rows.size / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_HOSTCAL_FILE", "HOSTCAL.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    val loadBefore = loadavg()
    val rows = measure(spark, sfDir)
    val loadAfter = loadavg()
    val hostRatio = hostRatioOf(rows)
    val qs = rows.map { case (n, b, m, r) =>
      f"""\"$n\":{\"baseline\":$b%s,\"measured\":$m%.6f,\"ratio\":$r%.3f}""" }
      .mkString("{", ",", "}")
    val line = f"""{"metric":"hostcal","host_ratio":$hostRatio%.3f,"baseline_provenance":"r13 idle BENCH_LOCAL (commit b82dd3f, loadavg 1.40)","queries":$qs%s,"loadavg_before":${JsonText.quote(loadBefore)}%s,"loadavg_after":${JsonText.quote(loadAfter)}%s,"sf":"$sfDir%s"}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[hostcal] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
  }
}
