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

  test("registrableDomainPsl rejects inputs already carrying reserved ladder columns") {
    val psl = Seq(Tuple1("com")).toDF("suffix")
    val df = Seq(("https://a.com/", 1)).toDF("url", "__sfx_2")
    assert(intercept[IllegalArgumentException] {
      UrlOps.registrableDomainPsl(df, "url", psl, "suffix")
    }.getMessage.contains("__sfx_2"))
  }

  test("registrableDomainPsl: longest-matching suffix, bare-suffix null, heuristic fallback") {
    val psl = Seq("com", "org", "uk", "co.uk", "com.au", "k12.ma.us")
      .map(Tuple1(_)).toDF("suffix")
    val docs = Seq(
      (1L, "https://news.bbc.co.uk/x"),      // two-level suffix → bbc.co.uk
      (2L, "https://www.example.com/"),      // one-level suffix → example.com
      (3L, "https://shop.big.com.au/y"),     // two-level → big.com.au
      (4L, "https://co.uk/"),                // host IS a suffix → null
      (5L, "https://x.example.zz/"),         // unlisted TLD → heuristic example.zz
      (6L, "https://a.b.school.k12.ma.us/"), // three-level suffix
      (7L, "not a url"))                     // no host → empty string
      .toDF("id", "url")
    val got = UrlOps.registrableDomainPsl(docs, "url", psl, "suffix")
      .select("id", "url_domain").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "bbc.co.uk")
    assert(got(2L) == "example.com")
    assert(got(3L) == "big.com.au")
    assert(got(4L) == null)
    assert(got(5L) == "example.zz")
    assert(got(6L) == "school.k12.ma.us")
    assert(got(7L) == "")
    // agrees with the heuristic wherever the list has no entry
    val both = UrlOps.registrableDomainPsl(docs, "url", psl, "suffix", "psl_dom")
      .select(col("id"), col("psl_dom"),
        UrlOps.registrableDomain(col("url")).as("heur_dom"))
      .where(col("id") === 5L).collect()(0)
    assert(both.getString(1) == both.getString(2))
  }

  test("dropBlockedDomains with a PSL: ccTLD entries block correctly") {
    val psl = Seq("com", "co.uk").map(Tuple1(_)).toDF("suffix")
    val docs = Seq(
      (1L, "https://news.bbc.co.uk/x"),  // registrable bbc.co.uk — blocked
      (2L, "https://other.co.uk/y"),     // registrable other.co.uk — kept
      (3L, "https://bbc.com/z"),         // different TLD — kept
      (4L, "https://www.bbc.co.uk/w"))   // same registrable — blocked
      .toDF("id", "url")
    val block = Seq(Tuple1("bbc.co.uk")).toDF("domain")
    val kept = UrlOps.dropBlockedDomains(docs, "url", block, "domain",
      psl = Some(psl), pslSuffixCol = "suffix")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 3L))
    // without the PSL the heuristic maps every *.co.uk host to co.uk,
    // so the bbc.co.uk entry matches nothing — the documented footgun
    val keptHeur = UrlOps.dropBlockedDomains(docs, "url", block, "domain")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptHeur == Seq(1L, 2L, 3L, 4L))
  }

  test("dropBlockedDomains: oversized list degrades to a shuffled anti-join, same result") {
    val docs = Seq(
      (1L, "https://bad.com/x"), (2L, "https://good.org/y")).toDF("id", "url")
    val block = Seq(Tuple1("bad.com")).toDF("domain")
    val small = UrlOps.dropBlockedDomains(docs, "url", block, "domain")
    val forcedShuffle = UrlOps.dropBlockedDomains(docs, "url", block, "domain",
      maxBroadcastDomains = 0L)
    assert(small.select("id").collect().map(_.getLong(0)).toSeq ==
      forcedShuffle.select("id").collect().map(_.getLong(0)).toSeq)
    // the gate really removes the hint: no broadcast in the logical plan
    assert(!forcedShuffle.queryExecution.optimizedPlan.toString
      .contains("strategy=broadcast"))
    assert(small.queryExecution.optimizedPlan.toString
      .contains("strategy=broadcast"))
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

  test("expandPslRules: wildcard tails from the corpus, exception removed + parent added") {
    val rules = Seq(
      "// comment line", "", "  ", "com", "co.uk",
      "*.ck", "!www.ck", "*.sch.uk  // trailing junk token")
      .map(Tuple1(_)).toDF("rule")
    val hosts = Seq(
      "www.ck", "x.www.ck", "foo.ck", "a.b.foo.ck", "bar.ck",
      "example.com", "x.alpha.sch.uk", "beta.sch.uk", "ck", "")
      .map(Tuple1(_)).toDF("h")
    val got = UrlOps.expandPslRules(rules, "rule", hosts, "h")
      .collect().map(_.getString(0)).toSet
    assert(got == Set(
      "com", "co.uk",       // plain rules pass through
      "ck",                 // parent of the !www.ck exception
      "foo.ck", "bar.ck",   // *.ck expanded over observed 2-label tails
      "alpha.sch.uk", "beta.sch.uk"), // *.sch.uk at depth 3
      got.toString)
    // the exception body itself must NOT be a suffix (www.ck tails are
    // observed in the corpus, so only the anti-join removes them)
    assert(!got.contains("www.ck"))
  }

  test("expandPslRules feeds registrableDomainPsl with full PSL semantics") {
    val rules = Seq("com", "*.ck", "!www.ck", "*.sch.uk").map(Tuple1(_)).toDF("rule")
    val docs = Seq(
      (1L, "https://www.ck/"),           // exception → registers as www.ck
      (2L, "https://x.www.ck/"),         // under the exception → www.ck
      (3L, "https://a.b.foo.ck/"),       // wildcard suffix foo.ck → b.foo.ck
      (4L, "https://foo.ck/"),           // host IS a wildcard suffix → null
      (5L, "https://x.alpha.sch.uk/"),   // depth-3 wildcard → x.alpha.sch.uk
      (6L, "https://beta.sch.uk/"))      // host IS the suffix → null
      .toDF("id", "url")
    val expanded = UrlOps.expandPslRules(
      rules, "rule", docs.select(UrlOps.host(col("url")).as("h")), "h")
    val got = UrlOps.registrableDomainPsl(docs, "url", expanded, "suffix")
      .select("id", "url_domain").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "www.ck", got.toString)
    assert(got(2L) == "www.ck", got.toString)
    assert(got(3L) == "b.foo.ck", got.toString)
    assert(got(4L) == null, got.toString)
    assert(got(5L) == "x.alpha.sch.uk", got.toString)
    assert(got(6L) == null, got.toString)
  }

  test("surtKey: reversed comma host, lowercased rest, schemeless passthrough") {
    assert(one("https://News.Example.co.uk/Path/A?Q=1", UrlOps.surtKey) ==
      "uk,co,example,news)/path/a?q=1")
    assert(one("http://example.org", UrlOps.surtKey) == "org,example)/")
    // non-default port survives canonicalization into the host part
    assert(one("http://example.org:8080/x", UrlOps.surtKey) == "org,example)/x")
    assert(one("not a url", UrlOps.surtKey) == "not a url")
  }

  test("cdxj: build -> parse round-trips fields; undecodable JSON raises") {
    val recs = Seq((1L, "https://A.example.com/p", "20260101", "200", "17"))
      .toDF("id", "url", "ts", "status", "length")
    val lines = UrlOps.cdxjBuild(recs, "url", "ts", Seq("status", "length"))
    val line = lines.collect()(0).getString(0)
    assert(line.startsWith("com,example,a)/p 20260101 {"))
    val back = UrlOps.cdxjParse(lines, "line",
      "url STRING, status STRING, length STRING").collect()(0)
    assert(back.getString(0) == "com,example,a)/p")
    assert(back.getString(2) == "https://A.example.com/p")
    assert(back.getString(3) == "200" && back.getString(4) == "17")
    val junk = Seq("surt 2026 {not json").toDF("line")
    val e = intercept[Exception] {
      UrlOps.cdxjParse(junk, "line", "url STRING").collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(m =>
        m.contains("FAILFAST") || m.toLowerCase.contains("malformed")) ||
        mentions(t.getCause))
    assert(mentions(e), e.toString)
  }

  test("expandPslRules fails loudly on malformed rules") {
    val hosts = Seq(Tuple1("a.com")).toDF("h")
    assert(intercept[IllegalArgumentException] {
      UrlOps.expandPslRules(Seq(Tuple1("a.*.b")).toDF("rule"), "rule", hosts, "h")
    }.getMessage.contains("a.*.b"))
    assert(intercept[IllegalArgumentException] {
      UrlOps.expandPslRules(Seq(Tuple1("!ck")).toDF("rule"), "rule", hosts, "h")
    }.getMessage.contains("!ck"))
    assert(intercept[IllegalArgumentException] {
      UrlOps.expandPslRules(Seq(Tuple1("*")).toDF("rule"), "rule", hosts, "h")
    }.getMessage.contains("*"))
  }
}
