package graft.rel

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class SketchesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val vocab = spark.read.parquet(s"$sf/documents.parquet")
    .select(explode(split(lower(col("text")), "\\s+")).as("term"))
    .filter(col("term") =!= "").distinct()

  test("bloom: NO false negative over the entire corpus vocabulary") {
    val bits = vocab
      .select(explode(Sketches.bloomPositions(col("term"))).as("pos"))
      .distinct()
    // every member term must test maybe_present: all its positions set
    val missing = vocab
      .select(col("term"), explode(Sketches.bloomPositions(col("term"))).as("pos"))
      .join(bits.withColumn("hit", lit(1)), Seq("pos"), "left")
      .groupBy(col("term"))
      .agg((count(lit(1)) === sum(coalesce(col("hit"), lit(0)))).as("ok"))
      .filter(!col("ok")).count()
    assert(missing == 0, "a Bloom filter must never report a member absent")
  }

  test("kmv: estimate within 35% of the exact distinct count on the fixture") {
    // the word vocabulary is tiny (~31) — estimate over 3-shingles
    // (thousands), the same population the catalog row uses
    val shingles = spark.read.parquet(s"$sf/documents.parquet")
      .filter(trim(col("text")) =!= "")
      .select(explode(graft.dedup.Dedup.shingles(col("text"))).as("term"))
      .distinct()
    val exact = shingles.count().toDouble
    val row = shingles
      .select(Sketches.uniformHash(col("term")).as("u")).distinct()
      .orderBy(col("u")).limit(Sketches.DefaultK)
      .agg(max(col("u")).as("u_k"), count(lit(1)).as("k_got")).head()
    val est = (row.getLong(1) - 1).toDouble / row.getDouble(0)
    val relErr = math.abs(est - exact) / exact
    // k = 64 → expected relative error ~ 1/sqrt(k-2) ≈ 0.13; 35% is a
    // loose determinism-safe bound on this fixed fixture
    assert(relErr < 0.35, s"KMV estimate $est vs exact $exact (err $relErr)")
  }

  test("hll rho matches a JVM bit-scan of the same md5 window") {
    // the hex-string-inspection rho (oracle-replayable) must agree
    // with an independent bit-level leading-zero count
    val rows = vocab
      .select(col("term"), Sketches.hllRho(col("term")).as("rho"))
      .collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val hex = md.digest(r.getString(0).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val window = BigInt(hex.substring(2, 15), 16) // 13 hex = 52 bits
      val expected = if (window == 0) 53 else 52 - window.bitLength + 1
      assert(r.getInt(1) == expected,
        s"rho mismatch for '${r.getString(0)}'")
    }
  }

  test("hll: estimate within 20% of exact on the shingle population") {
    val out = graft.Queries.q_hll_distinct(spark, sf).head()
    val est = out.getAs[Double]("estimate")
    val exact = out.getAs[Long]("n_exact").toDouble
    // m = 256 → expected relative error ~ 1.04/sqrt(256) ≈ 6.5%; 20%
    // is a loose determinism-safe bound on this fixed fixture
    assert(math.abs(est - exact) / exact < 0.20,
      s"HLL estimate $est vs exact $exact")
    // with ~16k distinct over 256 registers every register is hit
    assert(out.getAs[Int]("zero_registers") == 0)
  }

  test("cms: never undercounts any term, and the top hitter survives") {
    val w = 64; val d = 4
    val tf = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val keyed = tf.select(col("term"), col("cnt"),
      posexplode(Sketches.bloomPositions(col("term"), w, d))
        .as(Seq("h", "pos")))
    val counters = keyed.groupBy(col("h"), col("pos"))
      .agg(sum(col("cnt")).as("counter"))
    val joined = tf.join(
      keyed.select(col("term"), col("h"), col("pos"))
        .join(counters, Seq("h", "pos"))
        .groupBy(col("term")).agg(min(col("counter")).as("est")),
      Seq("term"))
    // one-sided error: a CMS point estimate is NEVER below the truth
    assert(joined.filter(col("est") < col("cnt")).count() == 0)
    // the heaviest term must still rank first under the sketch
    val exactTop = joined.orderBy(col("cnt").desc, col("term"))
      .head().getString(0)
    val cmsTop = joined.orderBy(col("est").desc, col("term"))
      .head().getString(0)
    assert(cmsTop == exactTop,
      s"heavy hitter lost in sketch: exact=$exactTop cms=$cmsTop")
  }

  test("uniformHash is deterministic and in [0, 1)") {
    val u = vocab.select(Sketches.uniformHash(col("term")).as("u"))
    assert(u.filter(col("u") < 0 || col("u") >= 1).count() == 0)
    val a = u.orderBy("u").limit(5).collect().map(_.getDouble(0)).toSeq
    val b = vocab.repartition(7)
      .select(Sketches.uniformHash(col("term")).as("u"))
      .orderBy("u").limit(5).collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }
}
