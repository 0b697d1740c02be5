package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the heavy bench queries. Not part of the
  * driver contract; run as
  * `sbt "runMain graft.tools.Profile <sfDir> <what>"`. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val what = if (args.length > 1) args(1) else "minhash"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.log4j.Logger
      .getLogger("org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .setLevel(org.apache.log4j.Level.INFO)
    import graft.io.Tables
    import graft.dedup.Dedup
    import graft.text.Tok
    // warm-up
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    what match {
      case "probecurve" =>
        // r18 verdict #4: q_ivfpq_probe_recall's first Bench sample
        // read 3.3× its warm wall (10.75 → 3.24 s under the rerun
        // guard). Split the cold cost in a FRESH JVM: (a) the saved
        // IVFPQ index build alone (the row's cacheKey via
        // Queries.pqEnsured), (b) the row's first run on the warm
        // index (plan codegen + partitioned-file listing cold),
        // (c) warm steady state — all under Bench's exact cache
        // discipline (clearAll between runs).
        def row(): Unit = {
          noop(graft.Queries.q_ivfpq_probe_recall(spark, sfDir))
          graft.io.Caches.clearAll(spark)
        }
        time("index ensure (BUILD)") { graft.Queries.pqEnsured(spark, sfDir) }
        time("row FIRST (warm index)") { row() }
        time("row warm 1") { row() }
        time("row warm 2") { row() }
        // component split on the warm index
        import graft.vector.{Pq, Quantize}
        val emb = Tables.table(spark, sfDir, "embeddings")
        val queries = emb.filter(col("vec_id") < graft.Queries.RecallQueryCount)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("q_embedding"))
        val quantized = emb.withColumn("qv", Quantize.int8(col("embedding")))
        time("truth pass (exactTopK)") {
          noop(Pq.exactTopK(quantized, queries, 5))
        }
        time("truth pass (repeat)") {
          noop(Pq.exactTopK(quantized, queries, 5))
        }
        graft.io.Caches.clearAll(spark)
        time("row warm 3 (post-split)") { row() }
      case "pq" =>
        import graft.vector.{Pq, Quantize}
        val emb = Tables.table(spark, sfDir, "embeddings")
        val path = time("ensure (build)") {
          Pq.ensureSavedIndex(emb, 16, 16, rounds = 2, nCells = 8,
            cacheKey = s"prof-ivfpq-$sfDir",
            epoch = Some(Tables.epochOf(spark, sfDir, "embeddings")))
        }
        time("ensure (repeat)") {
          Pq.ensureSavedIndex(emb, 16, 16, rounds = 2, nCells = 8,
            cacheKey = s"prof-ivfpq-$sfDir",
            epoch = Some(Tables.epochOf(spark, sfDir, "embeddings")))
        }
        val (_, books, cents) = time("loadIndex") { Pq.loadIndex(spark, path) }
        time("loadIndex (repeat)") { Pq.loadIndex(spark, path) }
        val quantized = emb.withColumn("qv", Quantize.int8(col("embedding")))
        time("encode noop") { noop(Pq.encode(quantized, books)) }
        time("encode noop (repeat)") { noop(Pq.encode(quantized, books)) }
        val queries = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("q_embedding"))
        for (i <- 1 to 3)
          time(s"adcTopK full $i") {
            noop(Pq.adcTopK(Pq.encode(quantized, books), books, queries, 5)
              .orderBy(col("query_id"), col("rank")))
          }
        for (i <- 1 to 3)
          time(s"ivfpq probed full $i") {
            val encCell = Pq.encodeWith(quantized, books, Seq("cell" ->
              graft.vector.FloatVecExpr.nearestCellF(col("qv"), cents)))
            noop(Pq.adcTopKProbed(encCell, books, cents, queries, 5, 2)
              .orderBy(col("query_id"), col("rank")))
          }

      case "micro" =>
        val docs = Tables.table(spark, sfDir, "documents")
        time("docs noop") { noop(docs) }
        time("tokens only") {
          noop(docs.select(col("doc_id"), Tok.tokens(col("text")).as("t")))
        }
        time("token explode") {
          noop(docs.select(col("doc_id"), explode(Tok.tokens(col("text"))).as("t")))
        }
        time("shingles col (no explode)") {
          noop(docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh")))
        }
        time("shingles explode") {
          noop(docs.select(col("doc_id"),
            explode(Dedup.shingles(col("text"), 3)).as("sh")))
        }
        time("shingles explode (again)") {
          noop(docs.select(col("doc_id"),
            explode(Dedup.shingles(col("text"), 3)).as("sh")))
        }
        val raw = spark.read.parquet(s"$sfDir/documents.parquet")
        time("no-spread shingles explode") {
          noop(raw.select(col("doc_id"),
            explode(Dedup.shingles(col("text"), 3)).as("sh")))
        }
      case "minhash" =>
        val docs = Tables.table(spark, sfDir, "documents")
        time("full q_minhash_candidates") {
          noop(Dedup.minhashCandidates(docs))
        }
        time("full (2nd run)") {
          noop(Dedup.minhashCandidates(docs))
        }
        val sh = docs.filter(trim(col("text")) =!= "")
          .select(col("doc_id"),
            explode(Dedup.shingles(col("text"), 3)).as("shingle"))
        time("shingle explode only") { noop(sh) }
        val minCols = (0 until 8).map(s =>
          min(md5(concat(lit(s.toString), lit("|"), col("shingle")))).as(s"h$s"))
        val sig = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
        time("signature groupBy") { noop(sig) }
        val bandKeys = (0 until 4).map(b =>
          concat((b * 2 until (b + 1) * 2).map(s => col(s"h$s")): _*))
        val banded = sig.select(col("doc_id"),
          posexplode(array(bandKeys: _*)).as(Seq("band", "band_key")))
        time("banded") { noop(banded) }
        val joined = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        time("join+distinct") { noop(joined) }
      case "simhash" =>
        val docs = Tables.table(spark, sfDir, "documents")
        time("withSimhash only") { noop(Dedup.withSimhash(docs).select("doc_id", "simhash")) }
        time("withSimhash (2nd)") { noop(Dedup.withSimhash(docs).select("doc_id", "simhash")) }
        time("full candidates") { noop(Dedup.simhashCandidates(docs, maxHamming = 6)) }
        time("full (2nd)") { noop(Dedup.simhashCandidates(docs, maxHamming = 6)) }
        val n = Dedup.simhashCandidates(docs, maxHamming = 6).count()
        println(s"[profile] candidate rows: $n")
      case "shuffles" =>
        // static shuffle inventory: count exchanges / sorts / scans in
        // every catalog query's initial physical plan (pre-AQE — an
        // upper bound; AQE may downgrade shuffles to broadcasts)
        val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          def cnt(p: String) = p.r.findAllIn(plan).size
          (name, cnt("Exchange hashpartitioning"), cnt("Exchange rangepartitioning"),
            cnt("BroadcastExchange"), cnt("\\bSort\\b"), cnt("FileScan"))
        }
        println(f"[profile] ${"query"}%-26s hash range bcast sort scan")
        rows.foreach { case (n, h, r, b, s, f) =>
          println(f"[profile] $n%-26s $h%4d $r%5d $b%5d $s%4d $f%4d")
        }
      case "explainreuse" =>
        for (q <- Seq("q_minhash_candidates", "q_simhash_candidates",
            "q_ngram_jaccard", "q_near_dup_signlsh")) {
          val df = graft.SparkEntry.queries(q)(spark, sfDir)
          df.collect() // execute THIS queryExecution so AQE finalizes
          val s = df.queryExecution.executedPlan.toString
          println(s"[profile] $q reusedExchange=" +
            s.sliding("ReusedExchange".length).count(_ == "ReusedExchange"))
          if (sys.env.contains("GRAFT_DUMP_PLAN"))
            println(s)
        }
      case "minhash2" =>
        val docs = Tables.table(spark, sfDir, "documents")
        def banded0 = {
          val sh = docs.filter(trim(col("text")) =!= "")
            .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("shingle"))
          val minCols = (0 until 8).map(s =>
            min(md5(concat(lit(s.toString), lit("|"), col("shingle")))).as(s"h$s"))
          val sig = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
          val bandKeys = (0 until 4).map(b =>
            concat((b * 2 until (b + 1) * 2).map(s => col(s"h$s")): _*))
          sig.select(col("doc_id"),
            posexplode(array(bandKeys: _*)).as(Seq("band", "band_key")))
        }
        def joinOf(b: DataFrame) =
          b.as("x").join(b.as("y"),
              col("x.band") === col("y.band") &&
                col("x.band_key") === col("y.band_key") &&
                col("x.doc_id") < col("y.doc_id"))
            .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
            .distinct()
        time("A: current (AQE broadcast)") { noop(joinOf(banded0)) }
        time("A (2nd)") { noop(joinOf(banded0)) }
        val rep = banded0.repartition(col("band"), col("band_key"))
        time("B: repartition both sides") { noop(joinOf(rep)) }
        time("B (2nd)") { noop(joinOf(rep)) }
        val cached = banded0.cache()
        time("C: cache banded") { noop(joinOf(cached)) }
        time("C (2nd)") { noop(joinOf(cached)) }
        cached.unpersist()
      case "text" =>
        for (q <- Seq("q_lang_id", "q_quality_score", "q_fingerprint",
            "q_token_count", "q_bpe_tokens")) {
          val fn = graft.SparkEntry.queries(q)
          time(q) { noop(fn(spark, sfDir)) }
          time(s"$q (2nd)") { noop(fn(spark, sfDir)) }
        }
      case "langcold" =>
        import graft.textan.TextAnalysis
        val docs0 = Tables.table(spark, sfDir, "documents")
        time("hitArray FIRST (cold)") {
          noop(docs0.select(col("doc_id"),
            TextAnalysis.stopwordHitArray(Tok.tokens(lower(col("text")))).as("sc")))
        }
        time("full q_lang_id after") {
          noop(graft.SparkEntry.queries("q_lang_id")(spark, sfDir))
        }
      case "langold" =>
        import graft.textan.TextAnalysis.stopwords
        val docs0 = Tables.table(spark, sfDir, "documents")
        val toks = Tok.tokens(lower(col("text")))
        def hits(lang: String) = size(filter(toks, t =>
          array_contains(array(stopwords(lang).map(lit): _*), t)))
        val scores = Seq("en", "fr", "es", "de").map(l => l -> hits(l))
        val best = greatest(scores.map(_._2): _*)
        val pick = scores.foldLeft(when(lit(false), lit("")): Column) {
          case (acc, (l, sc)) => acc.when(sc === best, lit(l))
        }
        val old = when(col("text").rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
          .when(best > 0, pick).otherwise(lit("und"))
        time("OLD detectLang cold") {
          noop(docs0.select(col("doc_id"), old.as("pred_lang")).orderBy(col("doc_id")))
        }
        time("OLD detectLang 2nd") {
          noop(docs0.select(col("doc_id"), old.as("pred_lang")).orderBy(col("doc_id")))
        }
      case "langphases" =>
        val df = graft.SparkEntry.queries("q_lang_id")(spark, sfDir)
        time("analyze") { df.queryExecution.analyzed }
        time("optimize") { df.queryExecution.optimizedPlan }
        time("physical") { df.queryExecution.executedPlan }
        time("execute") { noop(df) }
        val df2 = graft.SparkEntry.queries("q_lang_id")(spark, sfDir)
        time("all (2nd)") { noop(df2) }
        // pieces of the expression, cold each
        import graft.textan.TextAnalysis
        val docs = Tables.table(spark, sfDir, "documents")
        time("hitArray only") {
          noop(docs.select(col("doc_id"),
            TextAnalysis.stopwordHitArray(Tok.tokens(lower(col("text")))).as("sc")))
        }
        time("bind(hitArray) pick") {
          noop(docs.select(col("doc_id"),
            TextAnalysis.bind(
              TextAnalysis.stopwordHitArray(Tok.tokens(lower(col("text")))), sc =>
                when(array_max(sc) > 0, lit("x")).otherwise(lit("und"))).as("l")))
        }
        time("rlike only") {
          noop(docs.select(col("doc_id"),
            when(col("text").rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
              .otherwise(lit("u")).as("l")))
        }
      case "semantic2" =>
        val docs = Tables.table(spark, sfDir, "documents")
        val pieces = graft.text.chunk.RecursiveChunker(chunkSize = 50, overlap = 0)
          .chunk(docs)
        time("pieces (recursive min-split)") { noop(pieces) }
        val emb = graft.vector.HashingEmbedder(64).embed(pieces)
        time("embed") { noop(emb) }
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_index"))
        val withDist = emb
          .withColumn("next_emb", lead(col("embedding"), 1).over(w))
          .withColumn("dist",
            when(col("next_emb").isNotNull,
              lit(1.0) - graft.vector.FloatVecExpr.dotF(col("embedding"), col("next_emb")) /
                (graft.vector.FloatVecExpr.normF(col("embedding")) *
                  graft.vector.FloatVecExpr.normF(col("next_emb"))))
              .otherwise(lit(null)))
          .drop("embedding", "next_emb")
        time("withDist") { noop(withDist) }
        time("full chunk()") {
          noop(graft.text.chunk.SemanticChunker().chunk(docs))
        }
      case "semantic3" =>
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.table(spark, sfDir, "documents")
        val pieces = graft.text.chunk.RecursiveChunker(chunkSize = 50, overlap = 0)
          .chunk(docs)
          .select(col("doc_id"), col("source"), col("chunk_index"),
            col("text"), col("start"), col("end"), col("token_length"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_index"))
        val withDist = graft.vector.HashingEmbedder(64).embed(pieces)
          .withColumn("next_emb", lead(col("embedding"), 1).over(w))
          .withColumn("dist",
            when(col("next_emb").isNotNull,
              lit(1.0) - graft.vector.FloatVecExpr.dotF(col("embedding"), col("next_emb")) /
                (graft.vector.FloatVecExpr.normF(col("embedding")) *
                  graft.vector.FloatVecExpr.normF(col("next_emb"))))
              .otherwise(lit(null)))
          .drop("embedding", "next_emb")
          .cache()
        val bins = 1 << 12
        val step = 2.0 / bins
        val histo = time("histogram job (materializes cache)") {
          withDist
            .groupBy(when(col("dist").isNull, lit(-1))
              .otherwise(greatest(least(floor(col("dist") / step), lit(bins - 1)), lit(0))
                .cast("int")).as("bin"))
            .agg(count(lit(1)).as("cnt"), sum(col("token_length")).as("toks"))
            .collect()
        }
        println(s"[profile] histo rows ${histo.length}")
        val threshold = 0.9
        val seg = withDist
          .withColumn("brk",
            when(lag(col("dist"), 1).over(w) > threshold, 1).otherwise(0))
          .withColumn("segment",
            sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        val merged = seg.groupBy(col("doc_id"), col("source"), col("segment"))
          .agg(min(col("start")).as("start"), max(col("end")).as("end"))
        val segW = Window.partitionBy(col("doc_id")).orderBy(col("start"))
        val out = merged
          .join(docs.select(col("doc_id"), col("text").as("doc_text")), "doc_id")
          .withColumn("text",
            col("doc_text").substr(col("start") + lit(1), col("end") - col("start")))
          .withColumn("chunk_index", row_number().over(segW) - lit(1))
          .select(col("doc_id"), col("source"), col("chunk_index"), col("text"),
            col("start"), col("end"), length(col("text")).as("char_length"),
            Tok.tokenCount(col("text")).as("token_length"))
        time("final job") { noop(out) }
        time("final job (2nd)") { noop(out) }
        withDist.unpersist()
      case "semantic" =>
        val docs = Tables.table(spark, sfDir, "documents")
        time("full q_chunk_semantic") {
          noop(graft.text.chunk.SemanticChunker().chunk(docs))
        }
        time("full (2nd run)") {
          noop(graft.text.chunk.SemanticChunker().chunk(docs))
        }
        // stage decomposition of the floor
        import graft.text.chunk.RecursiveChunker
        import graft.vector.{FloatVecExpr, HashingEmbedder}
        import org.apache.spark.sql.expressions.Window
        val pieces = RecursiveChunker(chunkSize = 50, overlap = 0).chunk(docs)
          .select(col("doc_id"), col("source"), col("chunk_index"),
            col("text"), col("start"), col("end"), col("token_length"))
        time("min-split flatMap only") { noop(pieces) }
        val emb = HashingEmbedder(64).embed(pieces)
        time("+ embed UDF") { noop(emb) }
        val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_index"))
        val dist = emb
          .withColumn("next_emb", lead(col("embedding"), 1).over(w))
          .withColumn("dist",
            when(col("next_emb").isNotNull,
              lit(1.0) - FloatVecExpr.dotF(col("embedding"), col("next_emb")) /
                (FloatVecExpr.normF(col("embedding")) *
                 FloatVecExpr.normF(col("next_emb"))))
              .otherwise(lit(null)))
          .drop("embedding", "next_emb", "text")
        time("+ lead window + cosine dist") { noop(dist) }
      case "lsh" =>
        val emb = Tables.table(spark, sfDir, "embeddings")
        time("q_near_dup_lsh full") {
          noop(graft.Queries.q_near_dup_lsh(spark, sfDir))
        }
        time("q_near_dup_lsh (2nd)") {
          noop(graft.Queries.q_near_dup_lsh(spark, sfDir))
        }
        time("q_topk_lsh full") {
          noop(graft.Queries.q_topk_lsh(spark, sfDir))
        }
        time("q_near_dup_signlsh full") {
          noop(graft.Queries.q_near_dup_signlsh(spark, sfDir))
        }
        // candidate volume inside the deterministic BRP bucket join:
        // pairs within a bucket grow quadratically, so the histogram
        // is the early-warning for a degenerate bucket length
        val buckets = graft.vector.Ann.brpKeys(emb)
          .groupBy(col("table"), col("key")).count()
        time("bucket histogram") {
          buckets.orderBy(desc("count")).show(10, false)
          println("[profile] candidate pairs ≈ " +
            buckets.agg(sum(col("count") * col("count"))).head().getLong(0))
        }
      case "ivf" =>
        val emb = Tables.table(spark, sfDir, "embeddings")
        time("full q_topk_ivf") {
          noop(graft.Queries.q_topk_ivf(spark, sfDir))
        }
        time("full (2nd run)") {
          noop(graft.Queries.q_topk_ivf(spark, sfDir))
        }
      case "semdedup" =>
        import graft.vector.{Ivf, Quantize}
        val emb = Tables.table(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        time("emb noop") { noop(emb) }
        time("boundedIndex fit") {
          noop(Ivf.boundedIndex(emb, nCells = 8, rounds = 2)._1)
        }
        time("boundedIndex fit (2nd)") {
          noop(Ivf.boundedIndex(emb, nCells = 8, rounds = 2)._1)
        }
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        time("fit (no wholestage)") {
          noop(Ivf.boundedIndex(emb, nCells = 8, rounds = 2)._1)
        }
        time("fit (no wholestage 2nd)") {
          noop(Ivf.boundedIndex(emb, nCells = 8, rounds = 2)._1)
        }
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        val (assigned, _) = Ivf.boundedIndex(emb, nCells = 8, rounds = 2)
        val dq = Quantize.dotQ _
        val keyed = assigned.select(col("vec_id").as("doc_id"), col("cell"),
          col("qv"), dq(col("qv"), col("qv")).as("nn"))
        time("pairs (no persist)") {
          noop(graft.dedup.Banded
            .candidatePairs(keyed, Seq("cell"), carry = Seq("qv", "nn")))
        }
        for (i <- 1 to 3)
          time(s"full q_semdedup $i") {
            noop(graft.Queries.q_semdedup(spark, sfDir))
            graft.io.Caches.clearAll(spark)
          }
        for (i <- 1 to 3)
          time(s"full q_semdedup_incr $i") {
            noop(graft.Queries.q_semdedup_incremental(spark, sfDir))
            graft.io.Caches.clearAll(spark)
          }
      case "rowskew2" =>
        // r16: attribute the two worst giant ratios (q_repetition
        // 5.71×, q_html_extract 5.66× at the 50 MB giant) stage by
        // stage — the q_bpe_tokens method: find the serial pass.
        val dir50 = time("build 50MB giant-only corpus") {
          ScaleStress.skewDir(spark, sfDir, 50, giantOnly = true)
        }
        val docs = Tables.documents(spark, dir50)
        // driver-side DIRECT cutter timings: the pre-split pass is
        // the one irreducibly serial stage of both kernels
        val giantTxt = docs.orderBy(col("n_chars").desc)
          .select(col("text")).head.getString(0)
        val giantHtml = "<html><body><p>" + giantTxt + "</p></body></html>"
        for (i <- 1 to 3)
          time(s"rep: lookaheadPieces(50MB) driver $i") {
            Tok.lookaheadPieces(giantTxt, 1 << 19, 3).length
          }
        for (i <- 1 to 3)
          time(s"html: pageCutOffsets(50MB) driver $i") {
            graft.textan.Html.pageCutOffsets(giantHtml, 1 << 20).length
          }
        // --- q_repetition stages ---
        val pieceUdf = udf((text: String) =>
          Tok.lookaheadPieces(text, 1 << 19, 3))
        val nsp = spark.sessionState.conf.numShufflePartitions
        val cut = docs.filter(col("n_chars") > (1L << 21))
          .select(col("doc_id"),
            posexplode(pieceUdf(col("text"))).as(Seq("p", "pc")))
        for (i <- 1 to 2)
          time(s"rep: cut+explode $i") { noop(cut) }
        val shuffled = cut.repartition(nsp, col("doc_id"), col("p"))
        for (i <- 1 to 2)
          time(s"rep: cut+shuffle $i") { noop(shuffled) }
        val grams = shuffled
          .select(col("doc_id"),
            Tok.tokens(col("pc.piece")).as("ts"), col("pc.look").as("look"))
          .select(col("doc_id"), concat(col("ts"), col("look")).as("pts"),
            size(col("ts")).as("valid"))
          .select(col("doc_id"),
            explode_outer(graft.text.StrExpr.partGramCounts(
              col("pts"), col("valid"))).as("g"))
        for (i <- 1 to 2)
          time(s"rep: +tokenize+grams $i") { noop(grams) }
        for (i <- 1 to 2)
          time(s"rep: full q_repetition $i") {
            noop(graft.Queries.q_repetition(spark, dir50))
            graft.io.Caches.clearAll(spark)
          }
        // --- q_html_extract stages ---
        val page = docs
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
            concat(lit("<html><body><p>"), col("text"),
              lit("</p></body></html>")).as("html"))
        val hcut = page.filter(col("n_chars") > graft.textan.Html.PageSplitChars)
          .select(col("doc_id"), posexplode(udf((h: String) =>
            graft.textan.Html.pageCutOffsets(h, 1 << 20).map {
              case (s, e) => h.substring(s, e) })
            .apply(col("html"))).as(Seq("pi", "pc")))
        for (i <- 1 to 2)
          time(s"html: cut+explode $i") { noop(hcut) }
        for (i <- 1 to 2)
          time(s"html: full q_html_extract $i") {
            noop(graft.Queries.q_html_extract(spark, dir50))
            graft.io.Caches.clearAll(spark)
          }
      case "linedd" =>
        // r17: attribute q_line_dedup's in-situ row-skew interaction
        // (r16 row_skew: t_insitu 13.46 s vs t_only 3.68 + t_base
        // 0.77 — every other kernel is additive). Hypothesis under
        // test: the final collect_list aggregate is an
        // ObjectHashAggregate whose sort-based FALLBACK (default
        // threshold 128 in-memory groups) never fires on the
        // giant-only corpus (1 group) but always fires in-situ
        // (corpus doc count >> 128), so only the MIXED corpus pays a
        // sort over the giant's ~750k heavy line structs.
        val insitu = time("build corpus+50MB in-situ dir") {
          ScaleStress.skewDir(spark, sfDir, 50)
        }
        val only = time("build 50MB giant-only dir") {
          ScaleStress.skewDir(spark, sfDir, 50, giantOnly = true)
        }
        def stages(tag: String, dir: String): Unit = {
          val docs = Tables.documents(spark, dir)
          val lines = Dedup.linesOf(docs)
          for (i <- 1 to 2) time(s"$tag: linesOf $i") { noop(lines) }
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(md5(col("line"))).orderBy(col("doc_id"), col("p"))
          val kept = Dedup.linesOf(docs)
            .withColumn("kept", (row_number().over(w) === 1).cast("int"))
          for (i <- 1 to 2) time(s"$tag: +window kept $i") { noop(kept) }
          for (i <- 1 to 2) time(s"$tag: full lineDedup $i") {
            noop(Dedup.lineDedup(docs))
          }
          // the catalog row adds a bare global orderBy(doc_id) on
          // top — the range partitioner's SAMPLING pass re-executes
          // the final aggregate (the giant's 50 MB collect_list
          // group) a second time
          for (i <- 1 to 2) time(s"$tag: full q_line_dedup $i") {
            noop(graft.SparkEntry.queries("q_line_dedup")(spark, dir))
            graft.io.Caches.clearAll(spark)
          }
        }
        stages("base", sfDir)
        stages("only", only)
        stages("insitu", insitu)
        // the fallback-threshold A/B: same in-situ plan with the
        // object-hash aggregate allowed to keep every group in the
        // hash map (no sort fallback)
        spark.conf.set(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          "10000000")
        stages("insitu-nofallback", insitu)
      case "jobs" =>
        // r20: the sf0.1 tables are tiny (embeddings 2k / documents 5k
        // rows), so every bench wall is FIXED overhead — count the
        // Spark jobs a warm run of each named query submits and their
        // per-job walls, to attribute row cost to driver actions /
        // barriers instead of guessing from plan shape. Usage:
        //   runMain graft.tools.Profile <sfDir> jobs q_a,q_b
        val names = if (args.length > 2)
          args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        else Seq("q_ivfpq_probe_recall")
        final class JobLog extends org.apache.spark.scheduler.SparkListener {
          val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.put(js.jobId, (js.time,
              Option(js.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")))
          override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val st = jobs.remove(je.jobId)
            if (st != null) done.add((je.jobId, je.time - st._1, st._2))
          }
        }
        names.foreach { name =>
          val fn = graft.SparkEntry.queries(name)
          // warm run (index builds, codegen) outside the counted run
          noop(fn(spark, sfDir)); graft.io.Caches.clearAll(spark)
          val log = new JobLog
          spark.sparkContext.addSparkListener(log)
          val t0 = System.nanoTime()
          noop(fn(spark, sfDir))
          val wall = (System.nanoTime() - t0) / 1e9
          // drain the listener bus BEFORE detaching: a fixed sleep
          // silently dropped late onJobEnd events on a loaded host,
          // undercounting jobs/jobwall (r20 advice). waitUntilEmpty is
          // private[spark] — public at the bytecode level, so invoke
          // reflectively; fall back to the old sleep if the API moves.
          try {
            val bus = spark.sparkContext.getClass
              .getMethod("listenerBus").invoke(spark.sparkContext)
            bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
              .invoke(bus, java.lang.Long.valueOf(10000L))
          } catch { case _: Throwable => Thread.sleep(300) }
          spark.sparkContext.removeSparkListener(log)
          graft.io.Caches.clearAll(spark)
          val rows = log.done.toArray(Array.empty[(Int, Long, String)]).sortBy(_._1)
          println(f"[profile] $name%-28s wall ${wall}%7.3f s  jobs ${rows.length}%3d  " +
            f"jobwall ${rows.map(_._2).sum / 1e3}%7.3f s")
          rows.foreach { case (id, ms, desc) =>
            println(f"[profile]   job $id%4d ${ms / 1e3}%7.3f s  ${desc.take(90)}") }
        }
      case "dupcont" =>
        // r17: find the join that materialized a 192 MiB broadcast in
        // the starved SpillBench run of q_dup_containment at tile x10
        val tiled = graft.io.TempDirs.create("graft-dupcont-x10")
        ScaleStress.tile(spark, sfDir, tiled, 10)
        val df = graft.Queries.q_dup_containment(spark, tiled)
        noop(df) // let AQE finalize
        println(df.queryExecution.executedPlan.toString.take(12000))
      case other =>
        System.err.println(s"unknown profile target: $other")
    }
    spark.stop()
  }
}
