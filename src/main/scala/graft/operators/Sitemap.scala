package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** XML sitemap parsing (sitemaps.org protocol) — the crawl-frontier
  * seeding stage next to [[Robots]] (whose `sitemaps()` already
  * extracts the robots.txt `Sitemap:` pointers) and the WARC ingest
  * tier. Handles both document kinds: `<urlset>` (leaf sitemaps:
  * `<url>` entries with loc/lastmod/changefreq/priority) and
  * `<sitemapindex>` (`<sitemap>` entries pointing at child sitemaps).
  * Reference scope anchor: no sitemap surface exists in
  * `/root/reference/dataframe` — this extends the web-ingest tier the
  * brief mandates.
  *
  * The parser is a hand-rolled tag scan over the PUBLIC protocol
  * shape (the same policy as [[WebArchive]]'s HTML extraction — no XML
  * library): case-insensitive tags, whitespace-tolerant, the five
  * standard XML entities plus numeric references decoded in `<loc>`,
  * and loud IllegalArgumentException on structural corruption
  * (unclosed entry, missing loc, a urlset nested in a sitemapindex).
  * `lastmod` keeps DATE precision as epoch days (W3C datetime's
  * date-only form, the overwhelmingly common case); entries with
  * a missing lastmod get -1. `priority`/`changefreq` stay raw strings
  * (priority is a decimal literal — parsing it to float would trade
  * exactness for nothing).
  *
  * Scale: row-local string work under `mapPartitions`, one output row
  * per URL — the explode shape; payloads never shuffle.
  */
object Sitemap {

  final case class Entry(kind: String, ord: Int, loc: String,
      lastmodDay: Long, changefreq: String, priority: String)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** Decode the five standard XML entities + numeric references. */
  def unescapeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0) fail(s"unterminated XML entity in '$s'")
        val name = s.substring(i + 1, semi)
        name match {
          case "amp" => out += '&'
          case "lt" => out += '<'
          case "gt" => out += '>'
          case "quot" => out += '"'
          case "apos" => out += '\''
          case n if n.startsWith("#x") || n.startsWith("#X") =>
            out.appendAll(Character.toChars(Integer.parseInt(n.substring(2), 16)))
          case n if n.startsWith("#") =>
            out.appendAll(Character.toChars(Integer.parseInt(n.substring(1))))
          case other => fail(s"unknown XML entity '&$other;'")
        }
        i = semi + 1
      } else {
        out += c
        i += 1
      }
    }
    out.toString
  }

  /** The text of the first `<tag>…</tag>` inside [from, to), or null.
    * Case-insensitive; returns trimmed raw text (caller unescapes). */
  private def childText(xml: String, lower: String, from: Int, to: Int,
      tag: String): String = {
    val open = lower.indexOf(s"<$tag>", from)
    if (open < 0 || open >= to) return null
    val start = open + tag.length + 2
    val close = lower.indexOf(s"</$tag>", start)
    if (close < 0 || close > to) fail(s"unclosed <$tag> in sitemap entry")
    xml.substring(start, close).trim
  }

  /** W3C datetime (date-only or full) → epoch day; -1 for null. */
  private def lastmodToDay(s: String): Long =
    if (s == null || s.isEmpty) -1L
    else java.time.LocalDate.parse(s.take(10)).toEpochDay

  /** Parse one sitemap document: ("urlset" | "sitemapindex", entries).
    * Entries keep file order (`ord`). */
  def parse(xml: String): (String, Seq[Entry]) = {
    require(xml != null && xml.nonEmpty, "empty sitemap payload")
    val lower = xml.toLowerCase(java.util.Locale.ROOT)
    val isIndex = lower.contains("<sitemapindex")
    val isUrlset = lower.contains("<urlset")
    if (isIndex && isUrlset) fail("sitemap document mixes urlset and sitemapindex")
    if (!isIndex && !isUrlset) fail("neither <urlset> nor <sitemapindex> found")
    val (kind, entryTag) = if (isIndex) ("sitemapindex", "sitemap") else ("urlset", "url")
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pos = 0
    var ord = 0
    while ({ pos = lower.indexOf(s"<$entryTag>", pos); pos >= 0 }) {
      val start = pos + entryTag.length + 2
      val end = lower.indexOf(s"</$entryTag>", start)
      if (end < 0) fail(s"unclosed <$entryTag> at offset $pos")
      val loc = childText(xml, lower, start, end, "loc")
      if (loc == null || loc.isEmpty) fail(s"sitemap entry $ord missing <loc>")
      val lastmod = childText(xml, lower, start, end, "lastmod")
      val cf = childText(xml, lower, start, end, "changefreq")
      val pr = childText(xml, lower, start, end, "priority")
      out += Entry(kind, ord, unescapeXml(loc), lastmodToDay(lastmod),
        if (cf == null) "" else cf, if (pr == null) "" else pr)
      ord += 1
      pos = end + entryTag.length + 3
    }
    require(out.nonEmpty, s"<$kind> document with zero entries")
    (kind, out.toSeq)
  }

  /** Explode a (doc_id, xml) frame into one row per sitemap entry —
    * (doc_id, kind, ord, loc, lastmod_day, changefreq, priority).
    * Row-local. */
  def sitemapFrame(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(xmlCol))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, xml) =>
        val (kind, entries) = parse(xml)
        entries.iterator.map(e =>
          (id, kind, e.ord, e.loc, e.lastmodDay, e.changefreq, e.priority))
      })
      .toDF("doc_id", "kind", "ord", "loc", "lastmod_day", "changefreq", "priority")
  }

  /** Deterministic fixture sitemap XML: a `<urlset>` of `n` URLs for
    * seed `id` (or a `<sitemapindex>` when `index`), with an encoded
    * entity in every loc so the entity decode stays hot. */
  def fixtureXml(id: Long, n: Int, index: Boolean): String = {
    require(n >= 1, s"fixture needs >= 1 entries, got $n")
    val sb = new StringBuilder("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    if (index) {
      sb ++= "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
      for (j <- 0 until n) {
        val day = java.time.LocalDate.ofEpochDay(19723L + (id + j) % 365)
        sb ++= s"  <sitemap><loc>http://site$id.example/maps/sitemap$j.xml?a=1&amp;b=2</loc>" +
          s"<lastmod>$day</lastmod></sitemap>\n"
      }
      sb ++= "</sitemapindex>\n"
    } else {
      sb ++= "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
      for (j <- 0 until n) {
        val day = java.time.LocalDate.ofEpochDay(19723L + (id + j) % 365)
        val cf = Seq("daily", "weekly", "monthly")(j % 3)
        val pr = Seq("0.25", "0.5", "0.75", "1.0")(j % 4)
        sb ++= s"  <url><loc>http://site$id.example/page$j?a=1&amp;b=2</loc>" +
          s"<lastmod>$day</lastmod><changefreq>$cf</changefreq>" +
          s"<priority>$pr</priority></url>\n"
      }
      sb ++= "</urlset>\n"
    }
    sb.toString
  }
}
