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
  *   sbt "runMain graft.tools.ScaleStress [baseDir] [factor] [q1,q2,..]"
  *   sbt "runMain graft.tools.ScaleStress rowskew [baseDir] [mb,mb]"
  * The optional query list restricts the factor run to a subset of
  * the catalog (any `SparkEntry.queries` key, not just [[Heavy]]) —
  * used for the deep factor-30 probe on the heaviest three, where
  * tiling disk/wall cost rules out the full ten.
  * The second form is the ROW-skew probe (one giant document amid the
  * corpus — the straggler axis uniform tiling can't reach; see
  * [[rowSkew]]); large giant sizes need driver heap, e.g.
  * SPARK_DRIVER_MEM=24g. Both modes write their own
  * `"section":"..."` line into SCALE_STRESS.json (overrides:
  * SPARK_GRAFT_SCALE_FILE for the file, SPARK_GRAFT_SCALE_SECTION for
  * a subset probe's section name) and exit non-zero on a breach — a breach
  * is a plan bug or an undocumented cap, never noise to swallow.
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

  private[tools] def tile(spark: SparkSession, baseDir: String, outDir: String,
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
    // Per-replica DIMENSION ROTATION + ±1% seeded noise. The noise
    // alone (the pre-r15 form) left replicas at cosine ≈ 0.9999 to
    // their base — genuine SEMANTIC near-dups — so every
    // embedding-near-dup query inherited factor-sized TRUE dup
    // cliques and an O(factor²) pair volume that measured the data,
    // not the plan (q_semdedup read 726× at factor 100 — a breach
    // manufactured entirely by the fixture, the embedding twin of
    // the text-perturbation rationale above). Rotating the dimension
    // order by r (mod dim) drops cross-replica cosine to the
    // corpus's random-pair level (~0.5 here); replicas dim apart
    // share a rotation but differ by the noise, so residual clique
    // size is bounded by ⌈factor/dim⌉, not factor. Replica 0 keeps
    // the original vectors byte-for-byte.
    // Cast back to array<float>: the noise division promotes to
    // double, and a tiled dir must be a schema-exact drop-in
    // (float-strict expressions like FloatVecDot reject doubles).
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("r") * IdStride).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(
          zip_with(
            transform(sequence(lit(0), size(col("embedding")) - 1),
              i => element_at(col("embedding"),
                (pmod(i + col("r"), size(col("embedding"))) + 1)
                  .cast("int"))),
            transform(sequence(lit(0), size(col("embedding")) - 1),
              i => ((pmod(xxhash64(col("vec_id"), col("r"), i), lit(1000))
                - 500).cast("float") / lit(50000f))),
            (x, n) => x + n)).cast("array<float>").as("embedding"),
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

  /** SCALE_STRESS.json holds one JSON line per harness section
    * (`"section":"factor10"`, `"section":"row_skew"`), so each mode
    * refreshes its own line without disturbing the other's. */
  private[tools] def upsertSection(path: String, section: String,
      line: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    val others =
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.readString(p).linesIterator
          .filter(_.trim.nonEmpty)
          .filterNot(_.contains(s""""section":"$section""""))
          .toSeq
      else Seq.empty
    java.nio.file.Files.writeString(p,
      (others :+ line).mkString("", "\n", "\n"))
  }

  // ===== row-skew mode: one giant document amid the corpus =====

  /** Per-document kernels whose cost is O(f(doc_length)) on a single
    * row — the one axis uniform tiling can't probe: no partitioning
    * splits a row, so one giant document is one straggler task.
    * q_chunk_recursive_split is the exception that PROVES the policy:
    * it runs the same chunker behind [[graft.text.chunk.DocSplit]]
    * (1 Mchar separator-snapped pre-split), so its giant-document
    * wall should collapse toward parallel while q_chunk_recursive's
    * stays serial — the committed delta between the two rows IS the
    * split policy's measured payoff. */
  val PerDocKernels: Seq[String] = Seq(
    "q_chunk_recursive", "q_chunk_recursive_split",
    "q_simhash_candidates", "q_bpe_tokens",
    "q_text_overlap_pairs", "q_chunk_semantic_corpus", "q_repetition",
    "q_classifier_filter",
    // r13: the lag-window-per-doc shape (posexplode → per-doc window
    // → per-doc aggregate) — a giant document is ONE window partition
    // task; previously unprobed (q_bigram_logprob shares it)
    "q_dsir_weights",
    // r13: line dedup — the per-LINE explode makes a giant document
    // naturally parallel; expected near-flat, pinning that the shape
    // needs no split policy
    "q_line_dedup",
    // r13b: the two new per-row regex kernels — a giant document is
    // one regexp task (words/lines arrays sized by the doc); probed
    // here to decide whether they need the split policy
    "q_html_extract", "q_gopher_rules")

  /** Deterministic giant text: seeded uniform draws over a 30k-word
    * synthetic vocabulary (~270x repetition per word at 50 MB — n-gram
    * and BPE kernels see realistic repetition, not all-distinct
    * tokens). Sentence punctuation every ~12 words so sentence-driven
    * kernels (semantic chunker) see boundaries. */
  private def giantText(targetBytes: Long): String = {
    val rnd = new scala.util.Random(20260814L)
    val sb = new java.lang.StringBuilder(targetBytes.toInt + 64)
    var w = 0
    while (sb.length < targetBytes) {
      sb.append('w').append(rnd.nextInt(30000))
      w += 1
      if (w % 12 == 0) sb.append('.')
      sb.append(' ')
    }
    sb.toString
  }

  /** Copy `baseDir` into a fresh temp sfDir whose `documents.parquet`
    * is either the base corpus with ONE extra ~`mb` MB document
    * appended (`giantOnly = false` — the in-situ straggler fixture)
    * or the giant document ALONE (`giantOnly = true` — the
    * kernel-exponent fixture: wall time is the giant's processing
    * cost directly, with no corpus work overlapping it). Returns the
    * dir. */
  private[tools] def skewDir(spark: SparkSession, baseDir: String,
      mb: Int, giantOnly: Boolean = false): String = {
    val out = graft.io.TempDirs.create(
      s"graft-rowskew${if (giantOnly) "-only" else ""}-$mb")
    val base = new java.io.File(baseDir)
    base.listFiles().filter(_.isFile)
      .filterNot(_.getName.startsWith("documents"))
      .foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(out, f.getName))
      }
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    import org.apache.spark.sql.Row
    val text = giantText(mb.toLong << 20)
    val giant = spark.createDataFrame(
      java.util.List.of(Row(IdStride - 1L, text, "en", "rowskew",
        text.length.toLong)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType, nullable = true))))
    (if (giantOnly) giant
     else docs.select(col("doc_id"), col("text"), col("lang"),
         col("source"), col("n_chars").cast("long").as("n_chars"))
       .unionByName(giant))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  /** Row-skew harness: bound each per-doc kernel's scaling EXPONENT
    * in doc length, not the straggler's absolute wall (one
    * unsplittable row is serial by construction). The kernel cost is
    * measured on GIANT-ONLY corpora (the giant document is the whole
    * documents table) at both sizes — `wall(big) / wall(small) ≤
    * (big/small) × 2.5`, so at 5→50 MB a linear kernel lands ≤10 and
    * a quadratic at ~100, with fixed session overhead only ever
    * LOWERING the ratio. The first harness form subtracted a
    * corpus-run baseline instead ("marginal cost"), and the small
    * giant's work hid inside the corpus's own parallel slack —
    * marginal ≈ 0 at 5 MB made a measured-linear kernel read as
    * 241× (see q_chunk_recursive in the r11 logs); giant-only walls
    * have nothing to hide behind. Each kernel also reports the
    * IN-SITU wall (base corpus + the biggest giant appended) next to
    * the corpus-only base — the straggler cost a real mixed corpus
    * would see; informational, since it is the kernel cost again by
    * construction. A kernel that ERRORS (e.g. OOM on per-row state)
    * fails loudly: that is a split-policy gap, not noise. */
  private def rowSkew(spark: SparkSession, baseDir: String,
      outFile: String, mbs: Seq[Int]): Unit = {
    val onlyDirs = mbs.map(mb => mb -> {
      System.err.println(s"[rowskew] building ${mb}MB giant-only corpus ...")
      skewDir(spark, baseDir, mb, giantOnly = true)
    })
    System.err.println(s"[rowskew] building corpus+${mbs.last}MB in-situ corpus ...")
    val insituDir = skewDir(spark, baseDir, mbs.last)
    spark.read.parquet(s"$baseDir/documents.parquet")
      .groupBy("lang").count().count() // session warm-up
    val loadBefore = loadavg()
    val allowed = (mbs.last.toDouble / mbs.head) * 2.5
    // scratch-iteration subset (comma-separated kernel names). The
    // CANONICAL committed row_skew section must come from a full run
    // — redirect subsets with SPARK_GRAFT_SCALE_FILE.
    val kernels = sys.env.get("SPARK_GRAFT_ROWSKEW_QUERIES")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(PerDocKernels)
    val rows = kernels.map { name =>
      def t(dir: String): Either[String, Double] =
        try Right(time(spark, name, dir, 2)._2)
        catch { case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}") }
      val base = t(baseDir)
      val onlys = onlyDirs.map { case (mb, d) => mb -> t(d) }
      val insitu = t(insituDir)
      val ratio = (onlys.head._2, onlys.last._2) match {
        // 0.2s floor: below it the small wall is session overhead and
        // the kernel is too cheap at 5MB for an exponent to exist
        case (Right(s1), Right(s2)) => Some(s2 / math.max(s1, 0.2))
        case _ => None
      }
      def cell(label: String, e: Either[String, Double]): String = e match {
        case Right(v) => f""""$label":$v%.3f"""
        case Left(err) => s""""${label}_error":${graft.JsonText.quote(err)}"""
      }
      val line = "\"" + name + "\":{" + (Seq(cell("t_base", base)) ++
        onlys.map { case (mb, e) => cell(s"t_only_${mb}mb", e) } ++
        Seq(cell(s"t_insitu_${mbs.last}mb", insitu)) ++
        ratio.map(v => f""""giant_ratio":$v%.2f""")).mkString(",") + "}"
      System.err.println(s"[rowskew] $name -> $line")
      (name, line, ratio,
        base.isRight && insitu.isRight && onlys.forall(_._2.isRight))
    }
    val breaches = rows.collect {
      case (n, _, Some(r), _) if r > allowed => n
      case (n, _, _, false) => n
    }
    val loadAfter = loadavg()
    val json =
      s"""{"section":"row_skew","base":"$baseDir","giant_mb":${mbs.mkString("[", ",", "]")},""" +
        f""""allowed_giant_ratio":$allowed%.1f,"pass":${breaches.isEmpty},""" +
        s""""breaches":${breaches.map(b => "\"" + b + "\"").mkString("[", ",", "]")},""" +
        s""""loadavg_before":"$loadBefore","loadavg_after":"$loadAfter",""" +
        s""""queries":${rows.map(_._2).mkString("{", ",", "}")}}"""
    println(json)
    upsertSection(outFile, "row_skew", json)
    if (breaches.nonEmpty) {
      System.err.println(
        s"[rowskew] STRAGGLER/SUPER-LINEAR: ${breaches.mkString(", ")}")
      sys.exit(1)
    }
  }

  /** Recursive-split crossover probe (r16 verdict #3): the split
    * path (q_chunk_recursive_split) pays one cut pass + an exchange
    * + a renumber window to buy parallel per-part chunking, and at
    * the 50 MB row-skew giant it still LOSES to the serial chunker
    * (10.0 vs 8.0 s r16) — this mode measures both rows on giant-only
    * corpora at growing sizes to find where (whether) the trade turns
    * positive, so the routing threshold can sit AT the measured
    * crossover instead of a claim. Section `recsplit_crossover`. */
  private def recSplit(spark: SparkSession, baseDir: String,
      outFile: String, mbs: Seq[Int]): Unit = {
    spark.read.parquet(s"$baseDir/documents.parquet")
      .groupBy("lang").count().count() // session warm-up
    val loadBefore = loadavg()
    val rows = mbs.map { mb =>
      System.err.println(s"[recsplit] building ${mb}MB giant-only corpus ...")
      val dir = skewDir(spark, baseDir, mb, giantOnly = true)
      val serial = time(spark, "q_chunk_recursive", dir, 2)._2
      val split = time(spark, "q_chunk_recursive_split", dir, 2)._2
      System.err.println(
        f"[recsplit] ${mb}MB serial=$serial%.2f split=$split%.2f")
      (mb, serial, split)
    }
    val loadAfter = loadavg()
    val qs = rows.map { case (mb, serial, split) =>
      f""""${mb}mb":{"serial_s":$serial%.3f,"split_s":$split%.3f,"split_wins":${split < serial}}""" }
      .mkString("{", ",", "}")
    val json =
      s"""{"section":"recsplit_crossover","base":"$baseDir",""" +
        s""""loadavg_before":"$loadBefore","loadavg_after":"$loadAfter",""" +
        s""""sizes":$qs}"""
    println(json)
    upsertSection(outFile, "recsplit_crossover", json)
  }

  /** Cross-modal saved-serve factor probe (r17 verdict #3): the
    * catalog row's EXACT serve funnel (Queries.crossmodalServeAt —
    * caption queries probing the saved clip-image IVF index) measured
    * with the image CORPUS grown ×`factor` at the production
    * geometry nCells = max(8, ⌊√n⌋), caption load held fixed — the
    * serve contract at 100 TB (the corpus grows; a query batch
    * doesn't). Candidate math predicts the wall: per caption,
    * candidates ≈ nProbe/nCells × n, so ×10 corpus at √n cells is
    * ≈3× candidates — `allowed` = 5. Build walls are reported but
    * unbounded (the offline phase). Section `crossmodal_factor`. */
  private def crossmodal(spark: SparkSession, outFile: String,
      factor: Int): Unit = {
    val nQ = graft.Queries.CrossModalServeN
    // session warm-up off the measured serve
    spark.range(1000).selectExpr("sum(id)").count()
    val loadBefore = loadavg()
    // one tier = (build wall, serve first, serve min, cells) at size n
    def tier(n: Int, build: Int => String,
        serve: String => org.apache.spark.sql.DataFrame)
        : (Double, Double, Double, Int) = {
      val cells = math.max(8, math.sqrt(n.toDouble).toInt)
      val tb = System.nanoTime()
      val path = build(cells)
      val buildS = (System.nanoTime() - tb) / 1e9
      def one(): Double = {
        val t0 = System.nanoTime()
        serve(path).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.io.Caches.clearAll(spark)
        dt
      }
      val first = one()
      (buildS, first, math.min(first, one()), cells)
    }
    def ivfTier(n: Int) = tier(n,
      cells => graft.Queries.ensureClipIndex(spark, n, cells,
        key = s"xm-scale-$n-$cells"),
      path => graft.Queries.crossmodalServeAt(spark, path, nQ))
    def pqTier(n: Int) = tier(n,
      cells => graft.Queries.ensureClipPqIndex(spark, n, cells,
        key = s"xm-scale-pq-$n-$cells"),
      // corpusN = n: the refine joins the shortlist back to the FULL
      // scaled corpus store, not just the query-sized slice
      path => graft.Queries.crossmodalPqServeAt(spark, path, nQ,
        corpusN = n))
    val (b1, f1, m1, c1) = ivfTier(nQ)
    val (bN, fN, mN, cN) = ivfTier(nQ * factor)
    val (pb1, pf1, pm1, _) = pqTier(nQ)
    val (pbN, pfN, pmN, _) = pqTier(nQ * factor)
    val loadAfter = loadavg()
    val allowed = 5.0
    val ratio = mN / m1
    val pratio = pmN / pm1
    val json =
      f"""{"section":"crossmodal_factor","metric":"crossmodal_serve","factor":$factor,"n_base":$nQ,"n_scaled":${nQ * factor},"queries_held_at":$nQ,"cells_base":$c1,"cells_scaled":$cN,"build_base_s":$b1%.3f,"build_scaled_s":$bN%.3f,"serve_base_first_s":$f1%.3f,"serve_base_min_s":$m1%.3f,"serve_scaled_first_s":$fN%.3f,"serve_scaled_min_s":$mN%.3f,"serve_ratio_min":$ratio%.2f,"pq_build_base_s":$pb1%.3f,"pq_build_scaled_s":$pbN%.3f,"pq_serve_base_first_s":$pf1%.3f,"pq_serve_base_min_s":$pm1%.3f,"pq_serve_scaled_first_s":$pfN%.3f,"pq_serve_scaled_min_s":$pmN%.3f,"pq_serve_ratio_min":$pratio%.2f,"allowed_ratio":$allowed%.1f,"pass":${ratio <= allowed && pratio <= allowed},"loadavg_before":"$loadBefore","loadavg_after":"$loadAfter"}"""
    println(json)
    upsertSection(outFile, "crossmodal_factor", json)
    if (ratio > allowed || pratio > allowed) {
      System.err.println(
        f"[crossmodal] serve ratio ivf=$ratio%.2f pq=$pratio%.2f > $allowed%.1f")
      sys.exit(1)
    }
  }

  /** Composed-retrieval saved-serve factor probe (r18 verdict #3):
    * the q_rag_e2e_indexed catalog row's EXACT funnel
    * (RagPipeline.run "hybrid_indexed" — saved-IVF dense serve +
    * saved-BM25 lexical serve + RRF + pushed-id citation) measured
    * with the DOCUMENT corpus grown ×`factor` (suffixed sources so
    * the chunk store truly grows — same-source copies would upsert
    * away) at the production geometry nCells = max(8, ⌊√nChunks⌋),
    * query load held fixed at the 3 flagship queries. The serve
    * should inherit the component serves' flatness: per query the
    * dense leg scores ≈ nProbe/√n × n ≈ 2√n candidates (×√10 ≈ 3.2
    * at factor 10 — the crossmodal bound argument), the BM25 leg
    * reads only query-term buckets (posting lists grow ×factor but
    * stay term-bounded), RRF and the citation lookup are
    * query-bounded. `allowed` = 5, the crossmodal probe's bound.
    * Build walls reported, unbounded (offline phase). Section
    * `rag_indexed_factor`. */
  private def ragServe(spark: SparkSession, baseDir: String,
      outFile: String, factor: Int): Unit = {
    import org.apache.spark.sql.DataFrame
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    docs.groupBy("lang").count().count() // session warm-up
    val loadBefore = loadavg()
    def corpusAt(f: Int): DataFrame =
      if (f <= 1) docs
      else (0 until f).map { i =>
        if (i == 0) docs
        else docs
          .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("source", concat(col("source"), lit(s"_x$i")))
      }.reduce(_ unionByName _)
    // (build+first-serve wall, serve first, serve min, cells) at ×f
    def tier(f: Int): (Double, Double, Double, Int) = {
      val corpus = corpusAt(f)
      // chunk-store size ∝ corpus chars; √n cells from the doc count
      // via the measured ~1.4 chunks/doc of the fixture chunker
      val nChunks = (docs.count() * f * 14L) / 10L
      val cells = math.max(8, math.sqrt(nChunks.toDouble).toInt)
      def serveOnce(): Double = {
        val t0 = System.nanoTime()
        graft.pipeline.RagPipeline.run(spark, corpus,
            graft.Queries.ragE2eQueries, "simple",
            graft.vector.LatticeEmbedder(8), "hybrid_indexed",
            indexKey = s"rag-scale-$f", epoch = Some(s"rag-scale-$f"),
            indexedCells = cells)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.io.Caches.clearAll(spark)
        dt
      }
      val tb = System.nanoTime()
      val buildS = { serveOnce(); (System.nanoTime() - tb) / 1e9 }
      val first = serveOnce() // epoch hit: serve-only
      (buildS, first, math.min(first, serveOnce()), cells)
    }
    val (b1, f1, m1, c1) = tier(1)
    val (bN, fN, mN, cN) = tier(factor)
    val loadAfter = loadavg()
    val allowed = 5.0
    val ratioFirst = fN / f1
    val ratio = mN / m1
    // honor the section override (verify-skill rule: subset/scratch
    // runs must not clobber the canonical section) — the canonical
    // factor-10 section is `rag_indexed_factor`; the factor-100 run
    // lands in `rag_indexed_factor100`
    val section = sys.env.getOrElse("SPARK_GRAFT_SCALE_SECTION",
      if (factor == 10) "rag_indexed_factor" else s"rag_indexed_factor$factor")
    val json =
      f"""{"section":"$section","metric":"rag_indexed_serve","factor":$factor,"base":"$baseDir","queries_held_at":${graft.Queries.ragE2eQueries.size},"cells_base":$c1,"cells_scaled":$cN,"build_base_s":$b1%.3f,"build_scaled_s":$bN%.3f,"serve_base_first_s":$f1%.3f,"serve_base_min_s":$m1%.3f,"serve_scaled_first_s":$fN%.3f,"serve_scaled_min_s":$mN%.3f,"serve_ratio_first":$ratioFirst%.2f,"serve_ratio_min":$ratio%.2f,"allowed_ratio":$allowed%.1f,"pass":${ratio <= allowed},"loadavg_before":"$loadBefore","loadavg_after":"$loadAfter"}"""
    println(json)
    upsertSection(outFile, section, json)
    if (ratio > allowed) {
      System.err.println(
        f"[ragserve] composed serve ratio $ratio%.2f > $allowed%.1f")
      sys.exit(1)
    }
  }

  /** QUERY-load factor probe for the composed saved serve — the QPS
    * axis of the 100 TB serving story (r19 verdict #4): every other
    * ragserve/crossmodal probe holds query load fixed and scales the
    * CORPUS; this one holds the corpus (and its production √n-cells
    * geometry) fixed and pushes ×10 / ×`factor` the flagship query
    * load through the warm q_rag_e2e_indexed funnel. What it pins:
    * per-query amortization — the serve's fixed costs (two memoized
    * index loads, plan build, job scheduling) should AMORTIZE across
    * a batch of queries, so per-query seconds must fall (or at least
    * not rise) as the batch grows; a superlinear blow-up (the
    * citation IN-list, the per-query probe resolution) would show
    * here first. Query texts are distinct variants (suffixed
    * flagship queries) — same shape a real high-QPS batch has. The
    * serve is warm for every measured wall (built once, epoch hits
    * only). Pass: per-query cost at ×`factor` ≤ 1.2× the base
    * per-query cost. Section `rag_qps_factor`. */
  private def ragQps(spark: SparkSession, baseDir: String,
      outFile: String, factor: Int): Unit = {
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    docs.groupBy("lang").count().count() // session warm-up
    val loadBefore = loadavg()
    val baseQ = graft.Queries.ragE2eQueries
    // same production geometry derivation as ragServe tier(1)
    val nChunks = (docs.count() * 14L) / 10L
    val cells = math.max(8, math.sqrt(nChunks.toDouble).toInt)
    def queriesAt(n: Int): Seq[String] =
      (0 until n).map(i =>
        if (i < baseQ.size) baseQ(i) else s"${baseQ(i % baseQ.size)} v$i")
    def serveOnce(qs: Seq[String]): Double = {
      val t0 = System.nanoTime()
      graft.pipeline.RagPipeline.run(spark, docs, qs, "simple",
          graft.vector.LatticeEmbedder(8), "hybrid_indexed",
          indexKey = s"rag-qps/$baseDir", epoch = Some("rag-qps-v1"),
          indexedCells = cells)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.io.Caches.clearAll(spark)
      dt
    }
    // build once — every measured wall below is a warm epoch hit
    val tb = System.nanoTime()
    serveOnce(queriesAt(baseQ.size))
    val buildS = (System.nanoTime() - tb) / 1e9
    def fm(n: Int): (Double, Double) = {
      val f = serveOnce(queriesAt(n))
      (f, math.min(f, serveOnce(queriesAt(n))))
    }
    val n1 = baseQ.size
    val (f1, m1) = fm(n1)
    val (f10, m10) = fm(n1 * 10)
    val (fN, mN) = fm(n1 * factor)
    val loadAfter = loadavg()
    val p1 = m1 / n1
    val p10 = m10 / (n1 * 10)
    val pN = mN / (n1 * factor)
    val allowed = 1.2
    val ratio = pN / p1
    val section = sys.env.getOrElse("SPARK_GRAFT_SCALE_SECTION",
      "rag_qps_factor")
    val json =
      f"""{"section":"$section","metric":"rag_qps","factor":$factor,"base":"$baseDir","corpus_held_fixed":true,"cells":$cells,"build_s":$buildS%.3f,"q_base":$n1,"q_mid":${n1 * 10},"q_scaled":${n1 * factor},"serve_base_first_s":$f1%.3f,"serve_base_min_s":$m1%.3f,"serve_mid_first_s":$f10%.3f,"serve_mid_min_s":$m10%.3f,"serve_scaled_first_s":$fN%.3f,"serve_scaled_min_s":$mN%.3f,"perq_base_s":$p1%.4f,"perq_mid_s":$p10%.4f,"perq_scaled_s":$pN%.4f,"perq_ratio":$ratio%.3f,"allowed_perq_ratio":$allowed%.1f,"pass":${ratio <= allowed},"loadavg_before":"$loadBefore","loadavg_after":"$loadAfter"}"""
    println(json)
    upsertSection(outFile, section, json)
    if (ratio > allowed) {
      System.err.println(
        f"[ragqps] per-query ratio $ratio%.3f > $allowed%.1f — fixed cost is not amortizing")
      sys.exit(1)
    }
  }

  def main(args: Array[String]): Unit = {
    val isRowSkew = args.headOption.contains("rowskew")
    val isRecSplit = args.headOption.contains("recsplit")
    val isCrossModal = args.headOption.contains("crossmodal")
    val isRagServe = args.headOption.contains("ragserve") ||
      args.headOption.contains("ragqps")
    if (isRagServe) {
      val outFile =
        sys.env.getOrElse("SPARK_GRAFT_SCALE_FILE", "SCALE_STRESS.json")
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val sparkRs = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      sparkRs.sparkContext.setLogLevel("WARN")
      val rest = args.drop(1)
      val baseDir = rest.find(_.contains("/"))
        .getOrElse("/root/testdata/sf0.01")
      if (args.headOption.contains("ragqps"))
        ragQps(sparkRs, baseDir, outFile,
          rest.flatMap(_.toIntOption).headOption.getOrElse(100))
      else
        ragServe(sparkRs, baseDir, outFile,
          rest.flatMap(_.toIntOption).headOption.getOrElse(10))
      sparkRs.stop()
      return
    }
    if (isCrossModal) {
      val outFile =
        sys.env.getOrElse("SPARK_GRAFT_SCALE_FILE", "SCALE_STRESS.json")
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val sparkXm = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      sparkXm.sparkContext.setLogLevel("WARN")
      // tolerate the rowskew/recsplit arg convention ("crossmodal
      // [baseDir] [factor]"): the fixture is generated, so a baseDir
      // arg is meaningless here — take the first INTEGER argument as
      // the factor and ignore path-shaped ones instead of crashing
      // on NumberFormatException (r18 review)
      crossmodal(sparkXm, outFile,
        args.drop(1).flatMap(_.toIntOption).headOption.getOrElse(10))
      sparkXm.stop()
      return
    }
    val rest = if (isRowSkew || isRecSplit) args.drop(1) else args
    val baseDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val factor =
      if (rest.length > 1 && !isRowSkew && !isRecSplit) rest(1).toInt else 10
    val queryNames: Seq[String] =
      if (!isRowSkew && rest.length > 2) rest(2).split(",").toSeq else Heavy
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

    if (isRowSkew) {
      val mbs = if (rest.length > 1)
        rest(1).split(",").map(_.trim.toInt).toSeq else Seq(5, 50)
      rowSkew(spark, baseDir, outFile, mbs)
      spark.stop()
      return
    }
    if (isRecSplit) {
      val mbs = if (rest.length > 1)
        rest(1).split(",").map(_.trim.toInt).toSeq else Seq(50, 100, 200)
      recSplit(spark, baseDir, outFile, mbs)
      spark.stop()
      return
    }

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
    val rows = queryNames.map { name =>
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
    // a subset probe can land in its own section so it never clobbers
    // the canonical heavy-query factor10/factor30 sections
    val section = sys.env.getOrElse("SPARK_GRAFT_SCALE_SECTION", s"factor$factor")
    val line =
      s"""{"section":"$section","metric":"scale_stress","factor":$factor,"base":"$baseDir","n_docs":$nDocs,""" +
        f""""allowed_ratio":$allowed%.2f,"pass":${breaches.isEmpty},""" +
        s""""breaches":${breaches.map(b => "\"" + b._1 + "\"").mkString("[", ",", "]")},""" +
        s""""loadavg_before":"$loadBefore","loadavg_after":"$loadAfter","queries":$qs}"""
    println(line)
    upsertSection(outFile, section, line)
    spark.stop()
    if (breaches.nonEmpty) {
      System.err.println(s"[scale] SUPER-LINEAR: ${breaches.map(_._1).mkString(", ")}")
      sys.exit(1)
    }
  }
}
