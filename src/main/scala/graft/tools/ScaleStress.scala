package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical 10x scale guard over the heaviest catalog queries — the
  * "would this survive 100x?" question answered by measurement
  * instead of plan reading. Tiles `documents`/`embeddings` `factor`x
  * into a temp dir (other tables copied verbatim), runs each heavy
  * query at 1x and at `factor`x, and asserts wall time grows no
  * faster than ~N·log N: `ratio <= factor * ln(fN)/ln(N) * 1.5`
  * (~19 at factor 10 on the sf0.1 corpus — an N^1.5 query lands at
  * ~32 and a quadratic one at ~100, so the bands don't overlap; the
  * 1.5 slack absorbs box noise, and fixed per-query session overhead
  * only ever LOWERS a ratio).
  *
  * Tiled text is deterministically perturbed per replica (token
  * salting + order shuffle, token COUNT preserved): naive tiling
  * creates factor-sized exact-duplicate clusters, and every near-dup
  * query would inherit an O(factor²) candidate-pair blowup that
  * measures the DATA, not the plan. Embeddings get ±1% seeded noise
  * for the same reason.
  *
  * Usage:
  *   sbt "runMain graft.tools.ScaleStress [baseDir] [factor]"
  * Writes SCALE_STRESS.json (override: SPARK_GRAFT_SCALE_FILE) and
  * exits non-zero when any query breaches the threshold — a breach is
  * a plan bug or an undocumented cap, never noise to swallow.
  */
object ScaleStress {

  /** The 10 heaviest catalog rows by the round-9 bench. */
  val Heavy: Seq[String] = Seq(
    "q_unigram_logprob", "q_corpus_filter", "q_substr_dedup",
    "q_bpe_tokens", "q_simhash_candidates", "q_bigram_logprob",
    "q_chunk_semantic_corpus", "q_tfidf_keywords", "q_rag_e2e_hybrid",
    "q_repetition")

  /** Deterministic per-replica perturbation: ~30% of tokens get a
    * replica-salted suffix, then the token order is Fisher-Yates
    * shuffled, both seeded by (doc_id, r). Token count is preserved —
    * corpus-size-driven work scales exactly by `factor` — while the
    * token multiset, shingle set, simhash (order-insensitive: salting
    * is what moves it), and long substring runs all diverge across
    * replicas. Replica 0 keeps the original text byte-for-byte. */
  private val perturb = udf((text: String, docId: Long, r: Int) => {
    if (text == null || r == 0) text
    else {
      val rnd = new scala.util.Random(docId * 1000003L + r)
      val words = text.split(" ", -1)
      var i = 0
      while (i < words.length) {
        if (rnd.nextDouble() < 0.3 && words(i).nonEmpty)
          words(i) = words(i) + "r" + r
        i += 1
      }
      var j = words.length - 1
      while (j > 0) {
        val k = rnd.nextInt(j + 1)
        val tmp = words(j); words(j) = words(k); words(k) = tmp
        j -= 1
      }
      words.mkString(" ")
    }
  })

  /** Replica-id offset: far above any fixture id, so tiled ids never
    * collide and replica 0 keeps the original ids (and their mod-N
    * fixture semantics) untouched. */
  private val IdStride = 10000000L

  private def tile(spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Unit = {
    val reps = spark.range(factor).select(col("id").cast("int").as("r"))
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    docs.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("r") * IdStride).as("doc_id"),
        perturb(col("text"), col("doc_id"), col("r")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("r") * IdStride).as("vec_id"),
        // ±1% seeded noise so replicas aren't exact-duplicate vectors
        when(col("r") === 0, col("embedding")).otherwise(
          zip_with(col("embedding"),
            transform(sequence(lit(0), size(col("embedding")) - 1),
              i => ((pmod(xxhash64(col("vec_id"), col("r"), i), lit(1000))
                - 500).cast("float") / lit(50000f))),
            (x, n) => x + n)).as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // remaining tables verbatim: the heavy queries only read the two
    // tiled tables, but copies keep the dir a complete, drop-in sfDir
    val base = new java.io.File(baseDir)
    base.listFiles().filter(_.isFile)
      .filterNot(f => f.getName.startsWith("documents")
        || f.getName.startsWith("embeddings"))
      .foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(outDir, f.getName))
      }
  }

  /** (first, min-of-runs) wall seconds. The first run includes any
    * build-once work (saved signature/BM25/IVF indexes keyed by dir);
    * the min is the steady-state serve. Both must scale — a quadratic
    * index BUILD is as disqualifying as a quadratic serve. */
  private def time(spark: SparkSession, name: String, dir: String,
      runs: Int): (Double, Double) = {
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val e = (System.nanoTime() - t0) / 1e9
      graft.io.Caches.clearAll(spark)
      e
    }
    (ts.head, ts.min)
  }

  private def loadavg(): String =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+").take(3).mkString(" ")
    catch { case _: Throwable => "" }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALE_FILE", "SCALE_STRESS.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = spark.read.parquet(s"$baseDir/documents.parquet").count()
    val allowed = factor *
      (math.log(factor.toDouble * nDocs) / math.log(nDocs.toDouble)) * 1.5

    val tiled = graft.io.TempDirs.create("graft-scale")
    System.err.println(s"[scale] tiling ${factor}x into $tiled ...")
    tile(spark, baseDir, tiled, factor)
    val nTiled = spark.read.parquet(s"$tiled/documents.parquet").count()
    require(nTiled == factor * nDocs, s"tile mismatch: $nTiled != $factor*$nDocs")

    // warm the session off the measured tables
    spark.read.parquet(s"$baseDir/documents.parquet")
      .groupBy("lang").count().count()

    val loadBefore = loadavg()
    val rows = Heavy.map { name =>
      val (f1, m1) = time(spark, name, baseDir, 2)
      val (fN, mN) = time(spark, name, tiled, 2)
      val r = (fN / f1, mN / m1)
      System.err.println(f"[scale] $name%-24s 1x first=$f1%.2f min=$m1%.2f  " +
        f"${factor}x first=$fN%.2f min=$mN%.2f  ratios=${r._1}%.1f/${r._2}%.1f")
      (name, f1, m1, fN, mN, r._1, r._2)
    }
    val loadAfter = loadavg()
    val breaches = rows.filter(r => r._6 > allowed || r._7 > allowed)
    val qs = rows.map { case (n, f1, m1, fN, mN, rf, rm) =>
      f"""\"$n\":{\"t1_first\":$f1%.3f,\"t1_min\":$m1%.3f,\"tN_first\":$fN%.3f,\"tN_min\":$mN%.3f,\"ratio_first\":$rf%.2f,\"ratio_min\":$rm%.2f}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"scale_stress","factor":$factor,"base":"$baseDir","n_docs":$nDocs,""" +
        f""""allowed_ratio":$allowed%.2f,"pass":${breaches.isEmpty},""" +
        s""""breaches":${breaches.map(b => "\"" + b._1 + "\"").mkString("[", ",", "]")},""" +
        s""""loadavg_before":"$loadBefore","loadavg_after":"$loadAfter","queries":$qs}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    spark.stop()
    if (breaches.nonEmpty) {
      System.err.println(s"[scale] SUPER-LINEAR: ${breaches.map(_._1).mkString(", ")}")
      sys.exit(1)
    }
  }
}
