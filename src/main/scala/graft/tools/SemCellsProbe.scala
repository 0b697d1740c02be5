package graft.tools

import org.apache.spark.sql.SparkSession

/** SemDeDup cell-scaling probe — the measurement behind the
  * "nCells scales with the corpus" scale path (Abbas et al. 2023;
  * SemDedup scaladoc).
  *
  * The catalog row q_semdedup pins nCells = 8 for oracle
  * replayability, so the canonical factor-100 leg measures an 8-cell
  * geometry at 100× the vectors: cell occupancy grows 100×, and
  * intra-cell banded pair volume with it (511 s / 165.7× on r15
  * HEAD — inside the bound, but clearly super-linear). The paper's
  * own answer is to scale the cell count with the corpus, holding
  * per-cell occupancy roughly constant. This probe times
  * [[graft.dedup.SemDedup.semanticDedup]] on the SAME ×`factor`
  * tiled corpus at a ladder of cell counts (fixed 8 → paper-scaled
  * 8·factor) and records the walls as SCALE_STRESS section
  * `semdedup_cells`, so the scale claim is a committed measurement,
  * not prose.
  *
  * Usage: sbt "runMain graft.tools.SemCellsProbe [baseDir] [factor] [cells,…]"
  */
object SemCellsProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val cellsLadder: Seq[Int] =
      if (args.length > 2) args(2).split(",").map(_.trim.toInt).toSeq
      else Seq(8, 8 * factor / 10, 8 * factor).map(math.max(1, _))
    val outFile =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_FILE", "SCALE_STRESS.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadBefore =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split("\\s+").take(3)
        .mkString(" ")
      catch { case _: Throwable => "" }
    val tiled = java.nio.file.Files
      .createTempDirectory("graft-semcells").toString
    System.err.println(s"[semcells] tiling ${factor}x into $tiled ...")
    ScaleStress.tile(spark, baseDir, tiled, factor)
    val emb = spark.read.parquet(s"$tiled/embeddings.parquet")
      .select("vec_id", "embedding")
    val rows = cellsLadder.map { k =>
      val t0 = System.nanoTime()
      graft.dedup.SemDedup.semanticDedup(emb, nCells = k)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.io.Caches.clearAll(spark)
      System.err.println(f"[semcells] nCells=$k%-5d wall=$wall%.1f s")
      f""""c$k":{"n_cells":$k,"sec":$wall%.3f}"""
    }
    val line =
      s"""{"section":"semdedup_cells","metric":"semdedup_cells",""" +
        s""""factor":$factor,"base":"$baseDir",""" +
        s""""loadavg_before":"$loadBefore",""" +
        s""""note":"same tiled corpus, semanticDedup at a cell-count ladder — the paper's nCells∝corpus scale knob measured",""" +
        s""""runs":${rows.mkString("{", ",", "}")}}"""
    println(line)
    ScaleStress.upsertSection(outFile, "semdedup_cells", line)
    spark.stop()
  }
}
