package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Capped-memory spill probe — the 100×-scale failure mode wall-time
  * tiling cannot exercise: when executor memory is scarce relative to
  * partition state, the heavy aggregates/joins must SPILL and finish,
  * not OOM. ScaleStress bounds wall-time growth at 128 GiB; this main
  * re-runs the heaviest catalog queries in a deliberately starved JVM
  * (drive with `SPARK_DRIVER_MEM=2g`, default `spark.memory.fraction`
  * lowered to 0.2) and records per-query spill metrics from the stage
  * listener. PASS = every query completes (spills allowed and
  * expected); any OOM/failure exits non-zero — that is a plan gap,
  * not noise.
  *
  * Artifact: one JSON line per (tile_factor, memory_fraction)
  * configuration, upserted into SPILL_BENCH.json keyed by its
  * `"section"` field (ScaleStress's section discipline) —
  * `{"section":"tile10_f0.2","metric":"spill_bench","heap_mb":…,
  *   "memory_fraction":…,"pass":…,"queries":{name:{"sec":…,
  *   "memory_spilled_mb":…,"disk_spilled_mb":…,"peak_exec_mb":…}}}`.
  */
object SpillBench {

  /** The heaviest catalog queries by committed bench wall time, plus
    * the widest-state shuffles (banded self-join, substr dedup; r13
    * adds the SemDeDup pair join and the composed training-mix
    * pipeline). */
  private val Heavy = Seq(
    "q_substr_dedup", "q_corpus_filter", "q_unigram_logprob",
    "q_bpe_tokens", "q_bm25_indexed", "q_semdedup", "q_semdedup_scaled",
    "q_training_mix", "q_pagerank", "q_minhash_recall", "q_cdx_dedup",
    "q_dsir_weights", "q_gopher_rules",
    // r14: the new inverted-index dedup (widest fresh shuffle) and
    // the streaming replay (state-store memory under starvation)
    "q_dup_containment", "q_events_watermark",
    // r17: the IVFPQ+refine serve — the shortlist→exact-rerank join
    // is the newest shuffle shape (saved-code ADC scan proposes, the
    // full-vector table joins back under starved memory). The default
    // list now EQUALS the committed tile10_f0.15 section's catalog so
    // a bare full run can never silently narrow the canonical
    // artifact.
    "q_topk_ivfpq_rerank",
    // r18 (r17 verdict #5): the probe-curve eval — THREE saved-index
    // serves at widening nProbe plus a persisted exact-lattice truth
    // pass in one plan family, the widest multi-serve shape; starved
    // coverage proves the eval wall is spill-safe too
    "q_ivfpq_probe_recall",
    // r19: the composed saved-serve flagship — store build (chunk +
    // embed + prefix-sum enumeration + two index persists) on the
    // first run, then the dense cell-pruned serve + term-pruned BM25
    // serve + RRF + citation join under the same starvation; the
    // user-facing query path must be spill-safe end to end
    "q_rag_e2e_indexed")

  private class SpillListener extends SparkListener {
    @volatile var memSpilled = 0L
    @volatile var diskSpilled = 0L
    @volatile var peakExec = 0L
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        memSpilled += m.memoryBytesSpilled
        diskSpilled += m.diskBytesSpilled
        peakExec = math.max(peakExec, m.peakExecutionMemory)
      }
    }
    def reset(): Unit = { memSpilled = 0L; diskSpilled = 0L; peakExec = 0L }
  }

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(" ")
    catch { case _: Throwable => "?" }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq else Heavy
    // state must exceed the starved pool for the probe to prove
    // anything: tile the corpus ×N (ScaleStress's tiler) by default
    val tileFactor = sys.env.getOrElse("SPARK_GRAFT_SPILL_TILE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val fraction = sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.2")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SPILL_FILE", "SPILL_BENCH.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // starve execution memory: with fraction 0.2 of a 2 GiB heap,
      // ~400 MB is shared by 32 concurrent tasks (~12 MB each) —
      // far below the heavy queries' aggregate state at sf0.1
      .config("spark.memory.fraction", fraction)
      // environment pin (r17): this container's jar set (Spark 4.1.2
      // with kryo-shaded-4.0.3/chill-0.10.0) cannot construct ANY
      // KryoSerializer — newKryo()'s default registration list
      // includes java.nio.HeapByteBuffer, which this Kryo's
      // FieldSerializer refuses (verified by a direct
      // `new KryoSerializer(conf).newKryo()` repro with no graft
      // code). Only this harness ever hits it: the starved
      // MemoryStore evicts deserialized blocks to disk through
      // SerializerManager's Kryo AUTOPICK, which is disabled by
      // explicitly setting spark.serializer — evictions then use
      // the (working) Java path. Well-provisioned sessions
      // (Verify/Bench) never evict, so they stay on defaults.
      .config("spark.serializer",
        "org.apache.spark.serializer.JavaSerializer")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new SpillListener
    spark.sparkContext.addSparkListener(listener)
    val heapMb = Runtime.getRuntime.maxMemory() >> 20
    System.err.println(s"[spill] heap=${heapMb}MB fraction=$fraction cpus=$cpus tile=$tileFactor")

    val sfDir =
      if (tileFactor <= 1) baseDir
      else {
        val out = graft.io.TempDirs.create(s"graft-spill-x$tileFactor")
        System.err.println(s"[spill] tiling $baseDir x$tileFactor -> $out ...")
        ScaleStress.tile(spark, baseDir, out, tileFactor)
        out
      }

    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count() // warm-up

    var pass = true
    val rows = names.map { name =>
      listener.reset()
      val t0 = System.nanoTime()
      val res =
        try {
          SparkEntryRef.run(spark, sfDir, name)
          None
        } catch { case e: Throwable =>
          pass = false
          // full stack to stderr: a starved-run failure is a plan gap
          // (or an environment defect) that needs the CALLER, not
          // just the exception class (the r17 Kryo hunt)
          e.printStackTrace()
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
        }
      val sec = (System.nanoTime() - t0) / 1e9
      graft.io.Caches.clearAll(spark)
      // listener events are posted async; give the bus a beat to
      // drain (listenerBus.waitUntilEmpty is private[spark])
      Thread.sleep(300)
      val cell = res match {
        case Some(err) =>
          s""""$name":{"error":${graft.JsonText.quote(err)}}"""
        case None =>
          f""""$name":{"sec":$sec%.3f,"memory_spilled_mb":${listener.memSpilled >> 20},""" +
            f""""disk_spilled_mb":${listener.diskSpilled >> 20},"peak_exec_mb":${listener.peakExec >> 20}}"""
      }
      System.err.println(s"[spill] $cell")
      cell
    }
    // one line per (tile, fraction) configuration, upserted like
    // ScaleStress's sections: re-running a config refreshes its own
    // line without clobbering other configs' results
    val section = s"tile${tileFactor}_f$fraction"
    val json =
      s"""{"section":"$section","metric":"spill_bench","sf":"$baseDir","tile_factor":$tileFactor,"heap_mb":$heapMb,""" +
        s""""memory_fraction":$fraction,"cpus":$cpus,"pass":$pass,""" +
        s""""loadavg":"${loadavg()}","queries":${rows.mkString("{", ",", "}")}}"""
    println(json)
    ScaleStress.upsertSection(outFile, section, json)
    spark.stop()
    if (!pass) sys.exit(1)
  }

  /** Indirection so the query map stays the single source of truth. */
  private object SparkEntryRef {
    def run(spark: SparkSession, sfDir: String, name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
  }
}
