package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Robots, Sitemap}

/** Sitemap protocol parsing: both document kinds, entity decode,
  * case-insensitive tags, loud-failure contracts, and the robots.txt
  * composition (Sitemap: pointers → parsed frontiers). */
class SitemapSpec extends AnyFunSuite {

  test("urlset fixture parses with decoded locs, epoch-day lastmod, raw priority") {
    val (kind, es) = Sitemap.parse(Sitemap.fixtureXml(7L, 4, index = false))
    assert(kind == "urlset" && es.length == 4)
    assert(es(0).loc == "http://site7.example/page0?a=1&b=2") // &amp; decoded
    assert(es(0).lastmodDay == 19723L + 7)
    assert(es.map(_.changefreq) == Seq("daily", "weekly", "monthly", "daily"))
    assert(es.map(_.priority) == Seq("0.25", "0.5", "0.75", "1.0"))
    assert(es.map(_.ord) == Seq(0, 1, 2, 3))
  }

  test("sitemapindex fixture parses as index entries") {
    val (kind, es) = Sitemap.parse(Sitemap.fixtureXml(8L, 2, index = true))
    assert(kind == "sitemapindex" && es.length == 2)
    assert(es(1).loc == "http://site8.example/maps/sitemap1.xml?a=1&b=2")
    assert(es(1).changefreq == "" && es(1).priority == "")
  }

  test("entities: numeric references and all five named forms decode; unknown fails") {
    assert(Sitemap.unescapeXml("a&amp;b&lt;c&gt;d&quot;e&apos;f") == "a&b<c>d\"e'f")
    assert(Sitemap.unescapeXml("x&#65;y&#x42;z") == "xAyBz")
    intercept[IllegalArgumentException](Sitemap.unescapeXml("bad&nbsp;here"))
    intercept[IllegalArgumentException](Sitemap.unescapeXml("trunc&amp"))
  }

  test("case-insensitive tags and optional fields") {
    val xml = """<?xml version="1.0"?><URLSET><URL><LOC>http://x.example/</LOC></URL></URLSET>"""
    val (kind, es) = Sitemap.parse(xml)
    assert(kind == "urlset" && es.head.loc == "http://x.example/")
    assert(es.head.lastmodDay == -1L && es.head.changefreq == "")
  }

  test("full W3C datetime lastmod keeps date precision") {
    val xml = "<urlset><url><loc>http://x/</loc>" +
      "<lastmod>2024-03-05T10:11:12+00:00</lastmod></url></urlset>"
    assert(Sitemap.parse(xml)._2.head.lastmodDay ==
      java.time.LocalDate.parse("2024-03-05").toEpochDay)
  }

  test("structural corruption fails loudly") {
    intercept[IllegalArgumentException](Sitemap.parse("<html>not a sitemap</html>"))
    intercept[IllegalArgumentException](
      Sitemap.parse("<urlset><url><loc>http://x/</loc></urlset>")) // unclosed <url>
    intercept[IllegalArgumentException](
      Sitemap.parse("<urlset><url></url></urlset>")) // missing loc
    intercept[IllegalArgumentException](
      Sitemap.parse("<urlset><sitemapindex></sitemapindex></urlset>")) // mixed
    intercept[IllegalArgumentException](Sitemap.parse("<urlset></urlset>")) // empty
  }

  test("robots.txt Sitemap: pointers compose into parsed frontiers") {
    val robots = "User-agent: *\nDisallow: /private\n" +
      "Sitemap: http://site3.example/sitemap.xml\n" +
      "Sitemap: http://site3.example/sitemap-news.xml\n"
    val pointers = Robots.sitemaps(robots)
    assert(pointers == Seq("http://site3.example/sitemap.xml",
      "http://site3.example/sitemap-news.xml"))
    // a crawl pipeline fetches each pointer and parses what comes back
    val fetched = pointers.zipWithIndex.map { case (_, i) =>
      Sitemap.fixtureXml(3L, i + 1, index = i == 0)
    }
    val parsed = fetched.map(Sitemap.parse)
    assert(parsed.map(_._1) == Seq("sitemapindex", "urlset"))
    assert(parsed.flatMap(_._2).length == 3)
  }
}
