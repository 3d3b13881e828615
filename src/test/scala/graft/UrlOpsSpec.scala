package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(url: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(url).toDF("u").select(c(col("u")).as("r")).collect()(0).getString(0)

  test("host: lowercases, drops userinfo and port; empty on schemeless garbage") {
    assert(one("HTTPS://User:pw@WWW.Example.COM:8443/a?b=1#f", UrlOps.host) == "www.example.com")
    assert(one("http://example.org", UrlOps.host) == "example.org")
    assert(one("not a url", UrlOps.host) == "")
    assert(one("/relative/path", UrlOps.host) == "")
  }

  test("registrableDomain: last two labels") {
    assert(one("https://news.site.example.com/x", UrlOps.registrableDomain) == "example.com")
    assert(one("https://localhost/x", UrlOps.registrableDomain) == "")
  }

  test("stripTrackingParams: runs, mixed positions, fragment, suffix-name safety") {
    assert(one("https://a.com/p?utm_source=f&utm_campaign=x&id=3", UrlOps.stripTrackingParams)
      == "https://a.com/p?id=3")
    assert(one("https://a.com/p?id=3&gclid=abc", UrlOps.stripTrackingParams)
      == "https://a.com/p?id=3")
    assert(one("https://a.com/p?utm_a=1&id=3&fbclid=z&b=2", UrlOps.stripTrackingParams)
      == "https://a.com/p?id=3&b=2")
    assert(one("https://a.com/p?UTM_SOURCE=f#frag", UrlOps.stripTrackingParams)
      == "https://a.com/p#frag")
    assert(one("https://a.com/p?utm_a=1&utm_b=2", UrlOps.stripTrackingParams)
      == "https://a.com/p")
    // tracking name as a SUFFIX of a longer legit name must survive
    assert(one("https://a.com/p?myutm_a=2", UrlOps.stripTrackingParams)
      == "https://a.com/p?myutm_a=2")
  }

  test("dropBlockedDomains removes listed registrable domains, case-insensitively") {
    val docs = Seq(
      (1L, "https://spam.Bad.COM/x"),       // subdomain of a listed domain
      (2L, "https://bad.com/y"),            // exact listed domain
      (3L, "https://good.org/z"),
      (4L, "https://notbad.com.good.org/")) // bad.com only as an inner label
      .toDF("id", "url")
    val block = Seq(Tuple1("BAD.com")).toDF("domain")
    val kept = UrlOps.dropBlockedDomains(docs, "url", block, "domain")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(3L, 4L))
  }

  test("canonicalize: case, userinfo, default/non-default port, empty path, fragment") {
    assert(one("HTTPS://U:p@WWW.A.COM:443/Docs/9?utm_x=1&id=9#Sec", UrlOps.canonicalize)
      == "https://www.a.com/Docs/9?id=9")
    assert(one("http://A.com:80", UrlOps.canonicalize) == "http://a.com/")
    assert(one("http://a.com:8080/x", UrlOps.canonicalize) == "http://a.com:8080/x")
    // https default port is scheme-aware: :443 on http is NOT default
    assert(one("http://a.com:443/x", UrlOps.canonicalize) == "http://a.com:443/x")
    // schemeless rows pass through untouched
    assert(one("not a url", UrlOps.canonicalize) == "not a url")
  }
}
