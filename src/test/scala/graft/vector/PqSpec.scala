package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Product quantization ([[Pq]]): the distributed bounded-rounds
  * per-subspace fit, the map-side encode, and the ADC serve are each
  * checked against an INDEPENDENT driver-side replay of the same
  * arithmetic (plain Scala loops, no Spark) — the BatchedEmbedderSpec
  * discipline. Order-freeness of the integer-sum fit is pinned by a
  * partition-layout A/B. */
class PqSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val sub = dim / m
  private val k = 4

  private def corpus(n: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(11)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  // ---- independent driver-side replay of the whole chain ----

  private def quantize(v: Seq[Float]): Array[Int] = {
    val mx = v.map(x => math.abs(x.toDouble)).max
    if (mx == 0) Array.fill(v.length)(0)
    else v.map(x => math.floor(x.toDouble * (127.0 / mx) + 0.5).toInt).toArray
  }

  private def subDist(qv: Array[Int], s: Int, cent: Array[Double]): Double = {
    var d = 0.0
    var j = 0
    while (j < sub) { val x = qv(s * sub + j).toDouble - cent(j); d += x * x; j += 1 }
    d
  }

  private def replayTrain(rows: Seq[(Long, Seq[Float])], rounds: Int)
      : (Map[Long, Array[Int]], Array[Array[Array[Double]]]) = {
    val qvs = rows.map { case (id, v) => id -> quantize(v) }.toMap
    var books = Array.tabulate(m)(s =>
      (0 until k).map(c => qvs(c.toLong).slice(s * sub, (s + 1) * sub)
        .map(_.toDouble)).toArray)
    for (_ <- 1 to rounds) {
      val next = books.map(_.clone())
      for (s <- 0 until m) {
        val assign = qvs.toSeq.map { case (id, qv) =>
          val ds = books(s).map(subDist(qv, s, _))
          (id, ds.indexOf(ds.min)) // first-minimum wins ties
        }
        for (c <- 0 until k) {
          val members = assign.filter(_._2 == c).map(_._1)
          if (members.nonEmpty) {
            val sums = new Array[Long](sub)
            members.foreach { id =>
              val qv = qvs(id)
              for (j <- 0 until sub) sums(j) += qv(s * sub + j)
            }
            next(s)(c) = sums.map(x => x.toDouble / members.size)
          }
        }
      }
      books = next
    }
    (qvs, books)
  }

  test("boundedTrain codebooks are exactly partition-layout-free and match the driver replay") {
    val rows = corpus(50)
    val df = rows.toDF("vec_id", "embedding")
    val (_, b3) = Pq.boundedTrain(df.repartition(3), m, k, rounds = 2)
    val (_, b13) = Pq.boundedTrain(df.repartition(13), m, k, rounds = 2)
    val (_, ref) = replayTrain(rows, rounds = 2)
    for (s <- 0 until m; c <- 0 until k) {
      assert(java.util.Arrays.equals(b3(s)(c), b13(s)(c)),
        s"layout-dependent codebook at s=$s c=$c")
      assert(java.util.Arrays.equals(b3(s)(c), ref(s)(c)),
        s"codebook diverges from driver replay at s=$s c=$c")
    }
  }

  test("encode matches the driver replay and is layout-free") {
    val rows = corpus(50)
    val df = rows.toDF("vec_id", "embedding")
    val (q, books) = Pq.boundedTrain(df, m, k, rounds = 2)
    val got = Pq.encode(q.repartition(7), books)
      .as[(Long, Seq[Int])].collect().toMap
    val (qvs, ref) = replayTrain(rows, rounds = 2)
    rows.foreach { case (id, _) =>
      val qv = qvs(id)
      val want = (0 until m).map { s =>
        val ds = ref(s).map(subDist(qv, s, _))
        ds.indexOf(ds.min)
      }
      assert(got(id) == want, s"encode mismatch for vec $id")
    }
  }

  test("adcTopK matches an exhaustive driver-side ADC ranking") {
    val rows = corpus(60)
    val df = rows.toDF("vec_id", "embedding")
    val queries = rows.take(2)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "q_embedding")
    val (q, books) = Pq.boundedTrain(df, m, k, rounds = 2)
    val got = Pq.adcTopK(Pq.encode(q, books), books, queries, 5)
      .select("query_id", "rank", "vec_id")
      .as[(Long, Int, Long)].collect().toSet

    val (qvs, ref) = replayTrain(rows, rounds = 2)
    val want = rows.take(2).flatMap { case (qid0, qv0) =>
      val qq = quantize(qv0)
      val scored = rows.map { case (id, _) =>
        val qv = qvs(id)
        val adc = (0 until m).map { s =>
          val ds = ref(s).map(subDist(qv, s, _))
          val code = ds.indexOf(ds.min)
          subDist(qq, s, ref(s)(code))
        }.sum
        (id, adc)
      }.sortBy { case (id, adc) => (adc, id) }.take(5)
      scored.zipWithIndex.map { case ((id, _), i) => (qid0 + 1000L, i + 1, id) }
    }.toSet
    assert(got == want)
  }

  test("adcTopKProbed == the full ADC ranking restricted to probed cells") {
    val rows = corpus(60)
    val df = rows.toDF("vec_id", "embedding")
    val queries = rows.take(2)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "q_embedding")
    val (assigned, cents) = Ivf.boundedIndex(df, nCells = 4, rounds = 2)
    val (q, books) = Pq.boundedTrain(df, m, k, rounds = 2)
    val enc = Pq.encode(q, books)
    val encCell = enc.join(assigned.select(col("vec_id"), col("cell")), "vec_id")
    val got = Pq.adcTopKProbed(encCell, books, cents, queries, 3, nProbe = 2)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect().toSet

    val probed = Ivf.probe(queries, cents, 2)
      .select("query_id", "cell").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cellOf = assigned.select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    val full = Pq.adcTopK(enc, books, queries, rows.size)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)].collect()
    val want = full.groupBy(_._1).toSeq.flatMap { case (qid, rs) =>
      rs.sortBy(_._2).map(_._3)
        .filter(v => probed(qid).contains(cellOf(v)))
        .take(3).zipWithIndex.map { case (v, i) => (qid, i + 1, v) }
    }.toSet
    assert(got == want)
  }

  test("saved IVF+PQ index serves bit-identical to the in-memory composition") {
    val rows = corpus(60)
    val df = rows.toDF("vec_id", "embedding")
    val queries = rows.take(2)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "q_embedding")
    val (_, cents) = Ivf.boundedIndex(df, nCells = 4, rounds = 2)
    val (q, books) = Pq.boundedTrain(df, m, k, rounds = 2)
    val encCell = Pq.encodeWith(q, books,
      Seq("cell" -> FloatVecExpr.nearestCellF(col("qv"), cents)))
    val mem = Pq.adcTopKProbed(encCell, books, cents, queries, 3, nProbe = 2)
      .collect().map(_.toSeq).toSet

    val path = Pq.ensureSavedIndex(df, m, k, rounds = 2, nCells = 4,
      cacheKey = "pq-spec-saved")
    val (codes, lb, lc) = Pq.loadIndex(spark, path)
    // lossless round-trip of both fits
    for (s <- 0 until m; c <- 0 until k)
      assert(java.util.Arrays.equals(lb(s)(c), books(s)(c)))
    assert(lc.zip(cents).forall { case (a, b) => java.util.Arrays.equals(a, b) })
    val served = Pq.adcTopKIndexed(codes, lb, lc, queries, 3, nProbe = 2)
      .collect().map(_.toSeq).toSet
    assert(served == mem)
  }

  test("adcRerankTopK with a full-corpus shortlist IS exactTopK") {
    val rows = corpus(50)
    val df = rows.toDF("vec_id", "embedding")
    val queries = rows.take(2)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "q_embedding")
    val (q, books) = Pq.boundedTrain(df, m, k, rounds = 2)
    val rr = Pq.adcRerankTopK(Pq.encode(q, books), books, q, queries, 5,
        shortlist = rows.size)
      .as[(Long, Int, Long, Long)].collect().toSet
    val ex = Pq.exactTopK(q, queries, 5)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(rr == ex)
  }

  test("exactTopK is the true lattice L2 ranking (integer distances)") {
    val rows = corpus(40)
    val df = rows.toDF("vec_id", "embedding")
    val queries = Seq((500L, rows(3)._2)).toDF("query_id", "q_embedding")
    val q = df.withColumn("qv", Quantize.int8(col("embedding")))
    val got = Pq.exactTopK(q, queries, 3)
      .select("rank", "vec_id", "l2_dist").as[(Int, Long, Long)].collect()
    val qq = quantize(rows(3)._2)
    val want = rows.map { case (id, v) =>
      val qv = quantize(v)
      (id, (0 until dim).map(j => { val d = (qq(j) - qv(j)).toLong; d * d }).sum)
    }.sortBy { case (id, d) => (d, id) }.take(3)
      .zipWithIndex.map { case ((id, d), i) => (i + 1, id, d) }
    assert(got.toSeq == want)
    assert(got.head._2 == 3L && got.head._3 == 0L) // self-match at distance 0
  }

  test("saved PQ index staleness: changed corpus rebuilds, unchanged serves the same dir") {
    val rows = corpus(40)
    val df = rows.toDF("vec_id", "embedding")
    val key = "pq-spec-staleness"
    val p1 = Pq.ensureSavedIndex(df, m, k, rounds = 2, nCells = 4,
      cacheKey = key)
    val p1b = Pq.ensureSavedIndex(df, m, k, rounds = 2, nCells = 4,
      cacheKey = key)
    assert(p1b == p1, "unchanged corpus must serve the existing index")
    // upsert: one vector moves — content fingerprint must catch it
    val changed = rows.map { case (id, v) =>
      if (id == 7L) (id, v.map(_ + 1f)) else (id, v)
    }.toDF("vec_id", "embedding")
    val p2 = Pq.ensureSavedIndex(changed, m, k, rounds = 2, nCells = 4,
      cacheKey = key)
    assert(p2 != p1, "changed corpus must rebuild into a fresh directory")
    val (_, b1, _) = Pq.loadIndex(spark, p1)
    val (_, b2, _) = Pq.loadIndex(spark, p2)
    assert((0 until m).exists(s => (0 until k).exists(c =>
      !java.util.Arrays.equals(b1(s)(c), b2(s)(c)))),
      "rebuilt codebooks must reflect the upserted corpus")
  }

  test("residualColumn matches the driver replay; residual serve stays in probed cells") {
    val rows = corpus(50)
    val df = rows.toDF("vec_id", "embedding")
    val (_, cents) = Ivf.boundedIndex(df, nCells = 4, rounds = 2)
    val (q, books) = Pq.boundedTrainResidual(df, cents, m, k, rounds = 2)
    // residual lattice vs plain Scala: floor((qv_j − cent_j)·8 + 0.5)
    val got = q.select("vec_id", "qv0", "cell", "qv")
      .as[(Long, Seq[Int], Int, Seq[Int])].collect()
    got.foreach { case (id, qv0, cell, rq) =>
      val cent = cents(cell)
      val want = qv0.indices.map(j =>
        math.floor((qv0(j).toDouble - cent(j)) * Pq.ResidualScale + 0.5).toInt)
      assert(rq == want, s"residual mismatch for vec $id")
    }
    // saved residual serve: deterministic, and every hit sits in a
    // cell the query probed
    val queries = rows.take(2)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "q_embedding")
    val path = Pq.ensureSavedResidualIndex(df, m, k, rounds = 2,
      nCells = 4, cacheKey = "pq-spec-residual")
    val (codes, lb, lc) = Pq.loadIndex(spark, path)
    for (s2 <- 0 until m; c2 <- 0 until k)
      assert(java.util.Arrays.equals(lb(s2)(c2), books(s2)(c2)))
    val served = Pq.adcTopKIndexedResidual(codes, lb, lc, queries, 3, 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(served.nonEmpty)
    val probed = Ivf.probe(queries, lc, 2)
      .select("query_id", "cell").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cellOf = q.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    served.foreach { case (qid, vid) =>
      assert(probed(qid).contains(cellOf(vid)),
        s"vec $vid served for query $qid from an unprobed cell")
    }
    val again = Pq.adcTopKIndexedResidual(codes, lb, lc, queries, 3, 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(served.toSeq == again.toSeq)
  }

  test("residual codes beat raw codes on clustered data (reconstruction error)") {
    // the synthetic fixture embeddings are near-random — PQ's
    // adversarial case, where residual and raw codes measure within
    // noise of each other (the committed recall rows pin that
    // honestly). This test constructs the data PQ is FOR — tight
    // clusters — and asserts the mechanism: with the coarse cells
    // resolving clusters, residual codebooks spend their codes on the
    // within-cluster noise and reconstruct strictly better than raw
    // codebooks that must cover every cluster's sub-centers.
    val rnd = new scala.util.Random(41)
    val nClusters = 8
    val centers = Array.fill(nClusters)(
      Array.fill(dim)(math.round(rnd.nextGaussian() * 10).toFloat))
    val rows: Seq[(Long, Seq[Float])] = (0 until 240).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.toSeq.map(x => x + 0.5f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (_, cents) = Ivf.boundedIndex(df, nCells = nClusters, rounds = 2)

    val (qRaw, rawBooks) = Pq.boundedTrain(df, m, k, rounds = 2)
    val (qRes, resBooks) = Pq.boundedTrainResidual(df, cents, m, k, rounds = 2)

    def meanErr(q: org.apache.spark.sql.DataFrame,
        books: Pq.Codebooks, scale: Double): Double = {
      val enc = Pq.encode(q, books).as[(Long, Seq[Int])].collect().toMap
      val qvs = q.select("vec_id", "qv").as[(Long, Seq[Int])].collect()
      val errs = qvs.map { case (id, qv) =>
        val codes = enc(id)
        (0 until m).map { s =>
          val cent = books(s)(codes(s))
          (0 until sub).map { j =>
            val d = (qv(s * sub + j).toDouble - cent(j)) / scale
            d * d
          }.sum
        }.sum
      }
      errs.sum / errs.length
    }
    val rawErr = meanErr(qRaw, rawBooks, 1.0)
    // residual lattice is ×8 — normalize back to qv units
    val resErr = meanErr(qRes, resBooks, Pq.ResidualScale.toDouble)
    info(f"mean reconstruction error: raw=$rawErr%.1f residual=$resErr%.1f")
    assert(resErr < rawErr * 0.7,
      s"residual reconstruction must clearly beat raw on clustered data: " +
        s"res=$resErr raw=$rawErr")
  }

  test("boundedTrain requires the seed vec_ids 0..k-1") {
    val rows = corpus(20).map { case (id, v) => (id + 100L, v) }
    val df = rows.toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pq.boundedTrain(df, m, k, rounds = 1)
    }
    assert(e.getMessage.contains("vec_ids 0"))
  }
}
