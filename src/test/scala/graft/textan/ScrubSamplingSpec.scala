package graft.textan

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.rel.Sampling

class ScrubSamplingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("redact replaces emails, urls, then long digit runs — in that order") {
    val got = Seq(
      "mail bob.smith+x@corp.example.com now",
      "see https://host.io/path?id=99887 today",
      "card 1234567890 ok, pin 123 kept",
      "no pii here")
      .toDF("text")
      .select(Scrub.redact(col("text")).as("r"))
      .as[String].collect().toSeq
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "see <URL> today")
    assert(got(2) == "card <NUM> ok, pin 123 kept") // <4 digits kept
    assert(got(3) == "no pii here")
  }

  test("deterministic sample: reproducible, partition-independent, ≈fraction") {
    val df = (1L to 4000L).toDF("k")
    val a = Sampling.deterministicSample(df, col("k"), 0.25)
      .select("k").as[Long].collect().toSet
    val b = Sampling.deterministicSample(df.repartition(13), col("k"), 0.25)
      .select("k").as[Long].collect().toSet
    assert(a == b) // pure function of the key
    val frac = a.size.toDouble / 4000
    assert(frac > 0.20 && frac < 0.30, s"fraction off: $frac")
    // nested property: a smaller fraction is a subset of a larger one
    val c = Sampling.deterministicSample(df, col("k"), 0.10)
      .select("k").as[Long].collect().toSet
    assert(c.subsetOf(a))
  }

  test("stratified sample honors per-stratum quotas; unknown strata dropped") {
    val df = (1L to 3000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "xx"))
      .toDF("k", "lang")
    val got = Sampling.stratifiedSample(df, col("k"), col("lang"),
        Map("en" -> 0.5, "fr" -> 0.1))
      .groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(!got.contains("xx"))
    assert(got("en") > 400 && got("en") < 600)   // ≈500 of 1000
    assert(got("fr") > 60 && got("fr") < 140)    // ≈100 of 1000
    // stratified "en" rows are exactly the plain 0.5 sample of en rows
    val en = Sampling.deterministicSample(
        df.filter(col("lang") === "en"), col("k"), 0.5)
      .select("k").as[Long].collect().toSet
    val enStrat = Sampling.stratifiedSample(df, col("k"), col("lang"),
        Map("en" -> 0.5)).select("k").as[Long].collect().toSet
    assert(enStrat == en)
  }
}
