package graft.rel

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class UrlsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("canonical: each rule on a crafted URL") {
    val cases = Seq(
      // fragment + tracking params + sort + default port + host case
      ("HTTPS://WWW.Ex.COM:443/a/b?z=1&utm_source=f&a=2#frag",
        "https://www.ex.com/a/b?a=2&z=1"),
      // http default port + trailing slash on non-root path
      ("http://Host.ORG:80/p/q/", "http://host.org/p/q"),
      // non-default port preserved; fbclid/gclid dropped
      ("https://h.io:8443/x?fbclid=1&gclid=2&k=v", "https://h.io:8443/x?k=v"),
      // root path untouched; emptied query drops its '?'
      ("https://h.io/?utm_campaign=c", "https://h.io/"),
      // no query, no fragment — identity modulo case
      ("HTTP://A.B/c", "http://a.b/c"),
      // bare tracking params (no '=') are still dropped
      ("https://h.io/x?fbclid&utm_&k=v", "https://h.io/x?k=v"),
      // scheme-less / relative input passes through UNCHANGED —
      // never the mangled '://<input>' form (ADVICE r13)
      ("/docs/rel/g1?x=1", "/docs/rel/g1?x=1"),
      ("mailto:a@b.c", "mailto:a@b.c"))
    val got = cases.toDF("url", "want")
      .withColumn("got", Urls.canonical(col("url")))
      .as[(String, String, String)].collect()
    got.foreach { case (url, want, g) =>
      assert(g == want, s"canonical($url)")
    }
  }

  test("canonical is IDEMPOTENT on well-formed URLs (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // structured generator: scheme://Host[:port]/path[?params][#frag]
    // — the precondition is a parseable absolute URL; canonical's
    // output must be a fixed point of canonical
    val seg = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaNumChar))
    val host = for {
      a <- seg; b <- Gen.oneOf("com", "org", "NET", "Io")
      up <- Gen.oneOf(identity[String] _, (s: String) => s.toUpperCase)
    } yield up(a) + "." + b
    val param = for {
      k <- Gen.oneOf("a", "b", "utm_source", "fbclid", "gclid", "z9")
      v <- seg
    } yield s"$k=$v"
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
      h <- host
      port <- Gen.oneOf("", ":80", ":443", ":8443")
      segs <- Gen.listOf(seg)
      slash <- Gen.oneOf("", "/")
      ps <- Gen.listOf(param)
      frag <- Gen.oneOf("", "#x", "#sec2")
      q = if (ps.isEmpty) "" else ps.mkString("?", "&", "")
    } yield s"$scheme://$h$port/${segs.mkString("/")}$slash$q$frag"
    val prop = Prop.forAll(Gen.listOfN(40, urlGen)) { urls =>
      val df = urls.toDF("url")
        .withColumn("c1", Urls.canonical(col("url")))
        .withColumn("c2", Urls.canonical(col("c1")))
      df.filter(col("c1") =!= col("c2")).isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("q_url_canonical: messy variant pairs collapse onto one key") {
    val out = graft.Queries.q_url_canonical(spark, sf)
    // cases 0/1 and 2/3 of every COMPLETE 7-doc block share a canon
    // (the trailing partial block has no partner for its variants)
    val nFull = spark.read.parquet(s"$sf/documents.parquet").count() / 7 * 7
    val collapsed = out.filter(col("doc_id") < nFull)
      .filter(col("doc_id") % 7 <= 3)
      .filter(col("n_same_canon") < 2).count()
    assert(collapsed == 0, "every 0/1 and 2/3 variant pair must collapse")
    assert(out.filter(col("canon").contains("utm_")).count() == 0)
    assert(out.filter(col("canon").contains("fbclid")).count() == 0)
    assert(out.filter(col("canon").rlike("#")).count() == 0)
    // variant 5 is scheme-less: canonical passes it through verbatim
    val rel = out.filter(col("doc_id") % 7 === 5)
    assert(rel.filter(col("canon") =!= col("url")).count() == 0)
    assert(rel.filter(col("canon").startsWith("://")).count() == 0)
  }

  test("q_cdx_dedup: revisits collapse, revisions survive") {
    val out = graft.Queries.q_cdx_dedup(spark, sf).cache()
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    // unchanged re-fetches (fetch_id in [50000, 50100)) are dups of
    // their original fetch (keeper == fetch_id - 50000)
    val refetch = out.filter(col("fetch_id") >= 50000 && col("fetch_id") < 50000 + 100)
    assert(refetch.filter(col("keep") =!= 0).count() == 0)
    assert(refetch.filter(col("keeper_id") =!= col("fetch_id") - 50000L)
      .count() == 0)
    // edited re-fetches are NEW revisions under the same URL
    val changed = out.filter(col("fetch_id") >= 60000)
    assert(changed.filter(col("keep") =!= 1).count() == 0)
    // every original fetch is its own keeper
    val orig = out.filter(col("fetch_id") < 50000)
    assert(orig.count() == n)
    assert(orig.filter(col("keep") =!= 1).count() == 0)
    out.unpersist()
  }
}
