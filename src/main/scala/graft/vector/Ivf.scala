package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second
  * scale path next to LSH ([[Ann.lshTopK]]): a k-means coarse
  * quantizer partitions the corpus into cells; a query probes only
  * its `nProbe` nearest cells, so the fine search touches
  * ~nProbe/nCells of the corpus instead of all of it.
  *
  * The quantizer is fit DRIVER-SIDE on a bounded, vec_id-sorted
  * sample (the standard IVF design — FAISS trains its coarse
  * quantizer on a sample offline too). That choice is deliberate at
  * both ends of the scale:
  *  - at 100 TB a distributed k-means over the full corpus would be
  *    an iteration of full-corpus jobs, while quantizer quality only
  *    needs ~100·nCells sample points;
  *  - a sequential Lloyd's loop over a SORTED sample is byte-
  *    deterministic regardless of partition layout or core count —
  *    a distributed fit sums floats in partition order and is not.
  *
  * Cell assignment is one narrow pass (broadcast centroids), and the
  * per-query fine search is an equi-join on `cell` — shuffle keyed on
  * short ints, corpus embeddings never move more than once.
  */
object Ivf {

  /** Hard cap on the driver-collected training sample: `maxSample`
    * rows × dim floats (64-dim default ⇒ ~13 MB at the cap). */
  val DefaultMaxSample = 50000

  /** Deterministic Lloyd's k-means on L2-normalized vectors.
    * Init: k evenly spaced rows of the sorted sample (spread beats
    * first-k when ids correlate with content). Ties → lowest cell.
    * Empty cells keep their previous centroid. */
  private[vector] def lloyd(sample: Array[Array[Float]], k: Int,
      maxIter: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "IVF quantizer needs a non-empty sample")
    val n = sample.length
    val dim = sample(0).length
    val kk = math.min(k, n)
    val cents = Array.tabulate(kk)(i => normalize(sample((i.toLong * n / kk).toInt)))
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      var r = 0
      while (r < n) {
        val v = normalize(sample(r))
        val c = nearest(cents, v)
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
        counts(c) += 1
        r += 1
      }
      moved = false
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          val nc = new Array[Double](dim)
          var j = 0
          while (j < dim) { nc(j) = sums(c)(j) / counts(c); j += 1 }
          if (!java.util.Arrays.equals(nc, cents(c))) { cents(c) = nc; moved = true }
        }
        c += 1
      }
      iter += 1
    }
    cents
  }

  private def normalize(v: Array[Float]): Array[Double] = {
    var s = 0.0
    var j = 0
    while (j < v.length) { s += v(j).toDouble * v(j); j += 1 }
    val n = math.sqrt(s)
    val out = new Array[Double](v.length)
    j = 0
    while (j < v.length) { out(j) = if (n > 0) v(j) / n else 0.0; j += 1 }
    out
  }

  /** Index of the nearest centroid by squared Euclidean distance;
    * first index wins ties. */
  private def nearest(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var j = 0
      val ct = cents(c)
      while (j < v.length && j < ct.length) {
        val x = v(j) - ct(j); d += x * x; j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Nearest-cell column over CONSTANT centroids: the codegen'd
    * fused-loop expression [[IntVecNearestCell]] — per row, squared
    * Euclidean distance to every centroid accumulated in ascending
    * dimension order, FIRST minimum wins ties (the same lowest-cell
    * rule as [[nearest]]). Stays map-side: the centroid matrix rides
    * the expression's references, no join, no shuffle. */
  private def nearestCellExpr(qv: org.apache.spark.sql.Column,
      cents: Array[Array[Double]]): org.apache.spark.sql.Column =
    FloatVecExpr.nearestCellF(qv, cents)

  /** DISTRIBUTED bounded-rounds k-means over int8-QUANTIZED vectors —
    * the fully oracle-replayable IVF fit (contrast [[index]]'s
    * driver-sample Lloyd's, whose data-dependent iteration count and
    * float accumulation order a SQL engine cannot replay):
    *
    *  - vectors are [[Quantize.int8]] lattice points, so every
    *    centroid update is `exact-integer sum / count` — ONE
    *    identically-rounded division per coordinate, order-free by
    *    construction (the BPE two-round-unroll trick applied to
    *    k-means);
    *  - exactly `rounds` update rounds, unconditionally — no
    *    convergence test, so the oracle unrolls the same fixed CTE
    *    chain;
    *  - each round is one narrow aggregate job (nCells × dim integer
    *    sums); assignment is a map-side expression over broadcast-
    *    literal centroids. At 100 TB: `rounds + 1` corpus scans and
    *    nothing else — no driver sample cap, no per-round shuffle of
    *    the embeddings.
    *
    * Init: the quantized vectors of the `nCells` lowest vec_ids.
    * Empty cells keep their previous centroid. Returns the assigned
    * corpus (with `qv` and `cell`) and the final centroids. */
  def boundedIndex(corpus: DataFrame, nCells: Int = 8, rounds: Int = 2)
      : (DataFrame, Array[Array[Double]]) = {
    val qcorpus = corpus.withColumn("qv", Quantize.int8(col("embedding")))
    // the fit reads the quantized corpus `rounds + 1` times (init
    // collect + one aggregate per round); persist only the NARROW
    // (vec_id, qv) projection for those passes, and release it before
    // returning — the returned frame re-derives qv from the corpus in
    // its own single pass, so it does not depend on this cache
    val fit = qcorpus.select(col("vec_id"), col("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Array[Array[Double]] = fit
        .filter(col("vec_id") < nCells).orderBy(col("vec_id"))
        .select(col("qv")).collect()
        .map(_.getAs[scala.collection.Seq[Int]](0).map(_.toDouble).toArray)
      // ALL of 0..nCells-1 must exist: a sparse id range would shift
      // every later centroid index and silently mis-key cells (the
      // oracle assumes cell c was seeded from vec_id c)
      require(cents.length == nCells,
        s"boundedIndex needs vec_ids 0..${nCells - 1} present, found ${cents.length}")
      val dim = cents(0).length
      for (_ <- 1 to rounds) {
        // bounded driver aggregate: nCells rows × dim exact integer sums
        val upd = fit
          .withColumn("cell", nearestCellExpr(col("qv"), cents))
          .groupBy(col("cell"))
          .agg(count(lit(1)).as("cnt"),
            array((0 until dim).map(j =>
              sum(element_at(col("qv"), j + 1)).cast("long")): _*).as("sums"))
          .collect()
        val next = cents.clone()
        upd.foreach { r =>
          val c = r.getInt(0)
          val cnt = r.getLong(1)
          next(c) = r.getAs[scala.collection.Seq[Long]]("sums")
            .map(s => s.toDouble / cnt).toArray
        }
        cents = next
      }
      (qcorpus.withColumn("cell", nearestCellExpr(col("qv"), cents)), cents)
    } finally fit.unpersist(blocking = false)
  }

  /** Assign each corpus row to its quantizer cell.
    * Returns (assignedCorpus, centroids) — reuse across queries. */
  def index(corpus: DataFrame, nCells: Int = 16, sampleFraction: Double = 1.0,
      seed: Long = 42L, maxIter: Int = 10,
      maxSample: Int = DefaultMaxSample): (DataFrame, Array[Array[Double]]) = {
    val sampled = if (sampleFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, sampleFraction, seed)
    // vec_id sort makes the collected order — and therefore the fit —
    // independent of partitioning; limit bounds driver memory
    val sample: Array[Array[Float]] = sampled
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(maxSample)
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    val centroids = lloyd(sample, nCells, maxIter)
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: scala.collection.Seq[Float]) =>
      nearest(bc.value, normalize(v.toArray)))
    val assigned = corpus.withColumn("cell", assignUdf(col("embedding")))
    (assigned, centroids)
  }

  /** Probe step: per query, the `nProbe` nearest quantizer cells by
    * cosine against the FLOAT-cast centroids (ties → lowest cell).
    * Output (query_id, q_embedding, cell) — tiny: |queries| × nProbe. */
  private[vector] def probe(queries: DataFrame, centroids: Array[Array[Double]],
      nProbe: Int): DataFrame =
    probeRanked(queries, centroids, nProbe).drop("crank")

  /** [[probe]] keeping the per-query cell rank (`crank`) — the
    * shared-scan form the probe-curve rows pool on: the candidates a
    * depth-`p` serve would score are exactly the pooled rows with
    * `crank <= p` (the rank filter commutes with the cell join and
    * the scoring expressions), so ONE widest-depth scan serves every
    * rung of a ladder with bit-identical scores instead of one scan
    * per rung (guide §2.4: share the pass). */
  private[graft] def probeRanked(queries: DataFrame,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    // centroid table is tiny → crossJoin(broadcast) to score cells
    val cents = centroids.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell", "centroid")
    queries.crossJoin(broadcast(cents))
      .withColumn("cdist",
        FloatVecExpr.dotF(col("q_embedding"), col("centroid")) /
          (FloatVecExpr.normF(col("q_embedding")) * FloatVecExpr.normF(col("centroid"))))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("cdist"), col("cell"))))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("q_embedding"), col("cell"), col("crank"))
  }

  /** Fine search: equi-join corpus ⋈ probed on cell — only probed
    * slices are scanned — then exact cosine, rank, top-k. ONE Column
    * tree for the in-memory and saved-index serves, so their scores
    * are bit-identical. */
  private def fineSearch(assignedCorpus: DataFrame, probed: DataFrame,
      k: Int): DataFrame =
    rankTopK(scoredProbed(assignedCorpus, probed), k)

  /** The scoring half of [[fineSearch]] without the per-query top-k
    * cut — probe-curve rows score once at the widest depth (probed
    * rows carrying `crank` flow through the join untouched), persist
    * the pool, and cut each rung with [[rankTopK]] after a `crank`
    * filter. Same Column tree as the single-depth serves. */
  private[graft] def scoredProbed(assignedCorpus: DataFrame,
      probed: DataFrame): DataFrame =
    assignedCorpus.join(broadcast(probed), "cell")
      .withColumn("cos_sim",
        round(FloatVecExpr.dotF(col("embedding"), col("q_embedding")) /
          (FloatVecExpr.normF(col("embedding")) *
            FloatVecExpr.normF(col("q_embedding"))), 6))

  /** The rank/cut half of [[fineSearch]] (same window, same
    * tiebreak), shared with the pooled probe-curve path. */
  private[graft] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_sim"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_sim"))
  }

  /** Top-k per query, probing the `nProbe` nearest cells. `queries`
    * carries (query_id, q_embedding). */
  def topK(assignedCorpus: DataFrame, centroids: Array[Array[Double]],
      queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame =
    fineSearch(assignedCorpus, probe(queries, centroids, nProbe), k)

  /** Top-k served from a LOADED index ([[loadIndex]]) with
    * STORAGE-level pruning: the probed cells are resolved driver-side
    * first (bounded by |queries| × nProbe — queries are small by
    * definition, mirroring [[graft.text.Bm25.topKIndexed]]'s term
    * collect), then pushed as a static `cell IN (…)` filter, which on
    * a `partitionBy("cell")` layout becomes a PartitionFilter — only
    * the probed nProbe/nCells of the index FILES are read at all.
    * Same probe + scoring trees as [[topK]] → identical scores. */
  def topKIndexed(corpusFromDisk: DataFrame, centroids: Array[Array[Double]],
      queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val probed = probe(queries, centroids, nProbe)
    val cells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    fineSearch(corpusFromDisk.filter(col("cell").isin(cells: _*)), probed, k)
  }

  /** Persist an index: the assigned corpus lands `partitionBy("cell")`
    * and the centroids as one tiny parquet. A loaded index serves
    * [[topK]] with STORAGE-level pruning — the `cell` equi-join
    * becomes a partition filter, so only the probed nProbe/nCells of
    * the files are read at all. This is the parquet-native stand-in
    * for the reference's ChromaDB persistence
    * (`/root/reference/Chunking_Strats/chromadb_rag.py:103-110`). */
  def saveIndex(assigned: DataFrame, centroids: Array[Array[Double]],
      path: String): Unit = {
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/corpus")
    val spark = assigned.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Memoized per (session UUID, path) like [[graft.vector.Pq
    * .loadIndex]] (bounded LRU — epoch-moving consumers mint a fresh
    * path per rebuild, so an unbounded memo would retain every
    * superseded version): the centroid collect is a driver-side
    * Spark job, and without the memo every serve on the documented
    * O(1) epoch-hit path paid it again (r19 review). Paths are
    * content-addressed (fresh TempDirs per rebuild), so a cached
    * entry can never go stale. */
  private val loadedIndexes = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[
        (String, String), (DataFrame, Array[Array[Double]])](32, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[
          (String, String), (DataFrame, Array[Array[Double]])]): Boolean =
        size() > 16
    })

  def loadIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (DataFrame, Array[Array[Double]]) = {
    // Sessions.uuid, not identityHashCode: identity hashes are not
    // unique across live sessions and can be REUSED after a stopped
    // session is GC'd, which would serve frames bound to a dead
    // session for the same path (r19 advice)
    val key = (graft.io.Sessions.uuid(spark), path)
    val hit = loadedIndexes.get(key)
    if (hit != null) hit
    else {
      val corpus = spark.read.parquet(s"$path/corpus")
      val cents = spark.read.parquet(s"$path/centroids")
        .orderBy("cell").collect()
        .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray)
      val v = (corpus, cents)
      loadedIndexes.put(key, v)
      v
    }
  }

  /** One saved index per cache key per JVM (build-once-serve-many,
    * same [[graft.io.SavedIndex]] staleness contract as [[graft.text
    * .Bm25.ensureSavedIndex]]): first call fits + assigns + persists
    * single-flight; every call re-checks the offered corpus (content
    * fingerprint scan, or an O(1) caller `epoch` token — see
    * SavedIndex's serve-cost policy) and a mismatch rebuilds into a
    * fresh directory (the superseded one parked for one rebuild
    * cycle, then reclaimed — SavedIndex's bounded-retention
    * contract) — an upserted corpus can never be served from the
    * pre-upsert index. */
  private val savedIndexes = new graft.io.SavedIndex("graft-ivf-idx")

  // corpus is BY-NAME through the ensure* surface (evaluated at most
  // once, via the lazy val in each caller): an epoch-hit serve must
  // never pay the corpus CONSTRUCTION — the RAG store's prefix-sum
  // enumeration runs a totals job at plan-build time, so even
  // building the DataFrame is a Spark job there (SavedIndex doc)
  private def ensureWith(cacheKey: String, corpus: => DataFrame,
      epoch: Option[String])(
      build: () => (DataFrame, Array[Array[Double]])): String =
    savedIndexes.ensure(cacheKey, corpus, epoch) { p =>
      val (assigned, cents) = build()
      saveIndex(assigned, cents, p)
    }

  def ensureSavedIndex(corpus: => DataFrame, nCells: Int,
      cacheKey: String, epoch: Option[String] = None): String = {
    lazy val c = corpus
    ensureWith(cacheKey, c, epoch)(() => index(c, nCells))
  }

  /** [[ensureSavedIndex]] for the DISTRIBUTED [[boundedIndex]] fit:
    * the `rounds + 1` corpus scans of the k-means run ONCE per cache
    * key per JVM, then every serve is a cell-pruned read of the
    * persisted `partitionBy("cell")` layout ([[topKIndexed]]) — the
    * build/serve split a persistent vector store actually runs
    * (fit offline, probe online), applied to the oracle-replayable
    * fit. Floats and the double centroids round-trip parquet
    * losslessly, and serve shares [[fineSearch]]'s Column trees with
    * the in-memory path, so served scores are bit-identical. */
  def ensureSavedBoundedIndex(corpus: => DataFrame, nCells: Int,
      rounds: Int, cacheKey: String, epoch: Option[String] = None): String = {
    lazy val c = corpus
    ensureWith(cacheKey, c, epoch)(() => boundedIndex(c, nCells, rounds))
  }
}
