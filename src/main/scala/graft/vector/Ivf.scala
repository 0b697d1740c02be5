package graft.vector

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second
  * scale path next to LSH ([[Ann.lshTopK]]): a k-means coarse
  * quantizer partitions the corpus into cells; a query probes only
  * its `nProbe` nearest cells, so the fine search touches
  * ~nProbe/nCells of the corpus instead of all of it.
  *
  * At 100 TB: the quantizer is fit on a bounded sample (driver-safe),
  * cell assignment is one narrow pass, and the per-query fine search
  * is an equi-join on `cell` — shuffle keyed on short ints, corpus
  * embeddings never move more than once. Deterministic via fixed
  * seed + deterministic tiebreaks.
  */
object Ivf {

  /** Assign each corpus row to its quantizer cell.
    * Returns (assignedCorpus, centroids) — reuse across queries. */
  def index(corpus: DataFrame, nCells: Int = 16, sampleFraction: Double = 1.0,
      seed: Long = 42L): (DataFrame, Array[Array[Double]]) = {
    val featurized = Ann.withFeatureVector(corpus, "embedding")
    val train = if (sampleFraction >= 1.0) featurized
      else featurized.sample(withReplacement = false, sampleFraction, seed)
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("features").fit(train)
    val assigned = model.transform(featurized)
      .withColumnRenamed("prediction", "cell")
      .drop("features")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** Top-k per query, probing the `nProbe` nearest cells. `queries`
    * carries (query_id, q_embedding). */
  def topK(assignedCorpus: DataFrame, centroids: Array[Array[Double]],
      queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val spark = assignedCorpus.sparkSession
    import spark.implicits._
    // centroid table is tiny → crossJoin(broadcast) to score cells
    val cents = centroids.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell", "centroid")
    val probed = queries.crossJoin(broadcast(cents))
      .withColumn("cdist",
        FloatVecExpr.dotF(col("q_embedding"), col("centroid")) /
          (FloatVecExpr.normF(col("q_embedding")) * FloatVecExpr.normF(col("centroid"))))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("cdist"), col("cell"))))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("q_embedding"), col("cell"))
    // fine search: equi-join on cell — only the probed slices scanned
    val scored = assignedCorpus.join(broadcast(probed), "cell")
      .withColumn("cos_sim",
        round(FloatVecExpr.dotF(col("embedding"), col("q_embedding")) /
          (FloatVecExpr.normF(col("embedding")) *
            FloatVecExpr.normF(col("q_embedding"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_sim"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos_sim"))
  }
}
