package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL politeness filtering (RFC 9309) — the
  * frontier-filter stage of a crawl pipeline, next to [[WebArchive]]'s
  * content ingest and [[UrlOps]]'s canonicalization.
  *
  * Semantics implemented (documented deviations noted):
  *  - groups of `User-agent:` lines followed by `Allow:`/`Disallow:`
  *    rules; `#` comments and unknown fields (Sitemap, Crawl-delay, …)
  *    ignored; field names case-insensitive;
  *  - group selection: every group naming the crawler's product token
  *    (case-insensitive exact token; a product-token PREFIX also
  *    matches, per RFC 9309 §2.2.1) combines; if none match, the `*`
  *    groups combine; if neither exists, everything is allowed;
  *  - rule matching: `*` matches any octet run, `$` anchors the end;
  *    most-specific (longest pattern string, the reference-parser
  *    tiebreak) wins; equal length → Allow wins (RFC 9309 §2.2.2);
  *    empty `Disallow:` value disallows nothing; no matching rule →
  *    allowed;
  *  - percent-encoding normalization is NOT performed here — pair with
  *    [[UrlOps]] canonicalization upstream so matcher and frontier see
  *    the same byte form.
  *
  * Scale shape: robots bodies are parsed ONCE per domain row
  * ([[compileRules]] — a mapPartitions over the domains table, whose
  * row count is #domains, not #URLs), then the frontier joins on
  * domain and evaluates the precompiled rule list per URL. The join is
  * a plain equi-join Catalyst/AQE can broadcast when the domain table
  * is small and shuffle-hash when it is not.
  */
object Robots {

  /** One access rule; `pattern` may contain `*` and a trailing `$`. */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse a robots.txt body and return the combined rule list that
    * applies to `agent` (see object doc for group selection). Rules
    * keep file order; [[isAllowed]] applies specificity, not order. */
  def parse(robotsTxt: String, agent: String): Seq[Rule] = {
    val want = agent.toLowerCase
    final case class Group(agents: List[String], rules: List[Rule])
    var groups = List.empty[Group]
    var curAgents = List.empty[String]
    var curRules = List.empty[Rule]
    var inAgents = true // consecutive user-agent lines extend the same group
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups = Group(curAgents.reverse, curRules.reverse) :: groups
      curAgents = Nil; curRules = Nil
    }
    robotsTxt.split("\n").foreach { raw =>
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) { flush(); inAgents = true }
            curAgents = value.toLowerCase :: curAgents
          case "allow" | "disallow" =>
            inAgents = false
            // empty Disallow means "disallow nothing" (RFC 9309 §2.2.2)
            if (value.nonEmpty) curRules = Rule(field == "allow", value) :: curRules
          case _ => // Sitemap, Crawl-delay, unknown fields: ignored
        }
      }
    }
    flush()
    val ordered = groups.reverse
    def agentMatches(ua: String): Boolean =
      ua.nonEmpty && ua != "*" && want.startsWith(ua)
    val specific = ordered.filter(_.agents.exists(agentMatches))
    val chosen =
      if (specific.nonEmpty) specific
      else ordered.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
  }

  /** `*`/`$` pattern match against a path (RFC 9309 §2.2.3). Greedy
    * two-pointer glob with backtracking — linear-ish, no regex. */
  def matches(pattern: String, path: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    var p = 0 // pattern index
    var s = 0 // path index
    var starP = -1
    var starS = -1
    while (true) {
      // a non-anchored pattern is a PREFIX match: exhausted mid-path
      // (or at the end) means matched
      if (p == pat.length && !anchored) return true
      if (s == path.length) {
        // path exhausted: only trailing stars may remain ('$' or not)
        var q = p
        while (q < pat.length && pat(q) == '*') q += 1
        return q == pat.length
      }
      if (p < pat.length && pat(p) == '*') { starP = p; p += 1; starS = s }
      else if (p < pat.length && pat(p) == path(s)) { p += 1; s += 1 }
      else if (starP >= 0) { starS += 1; s = starS; p = starP + 1 }
      else return false
    }
    false // unreachable
  }

  /** Most-specific-match decision: longest matching pattern wins;
    * tie → Allow; no match → allowed. */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (matches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len
          bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** Crawl-delay (seconds) for `agent`, from the same group-selection
    * rules as [[parse]] — the frontier scheduler's politeness knob.
    * The FIRST delay among the applicable groups wins; absent or
    * unparsable values → None (no delay mandated). */
  def crawlDelay(robotsTxt: String, agent: String): Option[Double] = {
    val want = agent.toLowerCase
    var curAgents = List.empty[String]
    var inAgents = true
    var sawSpecific = false // the agent has its OWN group → * never applies
    var starDelay: Option[Double] = None
    var agentDelay: Option[Double] = None
    def specific = curAgents.exists(ua => ua.nonEmpty && ua != "*" && want.startsWith(ua))
    robotsTxt.split("\n").foreach { raw =>
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) curAgents = Nil
            inAgents = true
            curAgents = value.toLowerCase :: curAgents
          case "crawl-delay" =>
            inAgents = false
            val d = value.toDoubleOption.filter(_ >= 0)
            if (specific) { sawSpecific = true; agentDelay = agentDelay.orElse(d) }
            else if (curAgents.contains("*")) starDelay = starDelay.orElse(d)
          case "allow" | "disallow" =>
            inAgents = false
            if (specific) sawSpecific = true
          case _ => ()
        }
      }
    }
    if (sawSpecific) agentDelay else starDelay
  }

  /** All `Sitemap:` URLs in file order (sitemaps are group-independent
    * per RFC 9309 — they apply to every crawler). */
  def sitemaps(robotsTxt: String): Seq[String] =
    robotsTxt.split("\n").iterator.map { raw =>
      val h = raw.indexOf('#')
      (if (h >= 0) raw.substring(0, h) else raw).trim
    }.filter(_.toLowerCase.startsWith("sitemap:"))
      .map(_.substring("sitemap:".length).trim)
      .filter(_.nonEmpty)
      .toSeq

  /** Serialized rule form for the compiled-rules column: `+pat` /
    * `-pat` (allow/disallow) — array-of-string survives a parquet
    * round-trip of the compiled table. */
  private[operators] def encodeRule(r: Rule): String =
    (if (r.allow) "+" else "-") + r.pattern
  private[operators] def decodeRule(s: String): Rule =
    Rule(s.charAt(0) == '+', s.substring(1))

  /** robots(domain, robots_txt) → (domain, rules array<string>): parse
    * ONCE per domain. Row count = #domains; persist/parquet this and
    * reuse it across frontier batches. */
  def compileRules(robots: DataFrame, agent: String): DataFrame = {
    val s = robots.sparkSession
    import s.implicits._
    robots.select(col("domain"), col("robots_txt"))
      .as[(String, String)]
      .mapPartitions(_.map { case (d, txt) =>
        (d, parse(txt, agent).map(encodeRule).toArray)
      })
      .toDF("domain", "rules")
  }

  /** Filter a frontier urls(…, domain, path) by compiled rules: plain
    * equi-join on domain (broadcast when the compiled table is small),
    * then a row-local matcher pass. URLs whose domain has no robots
    * row are ALLOWED (no robots.txt → no restrictions), preserved via
    * left join. Adds an `allowed` boolean; callers filter on it. */
  def politenessCheck(urls: DataFrame, compiled: DataFrame): DataFrame = {
    val s = urls.sparkSession
    import s.implicits._
    val joined = urls.join(compiled, Seq("domain"), "left")
    val cols = joined.columns
    val pathIdx = cols.indexOf("path")
    val rulesIdx = cols.indexOf("rules")
    require(pathIdx >= 0, "urls frame must carry a 'path' column")
    val schema = org.apache.spark.sql.types.StructType(
      joined.schema.fields.filterNot(_.name == "rules") :+
        org.apache.spark.sql.types.StructField("allowed",
          org.apache.spark.sql.types.BooleanType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    joined.mapPartitions { it =>
      it.map { row =>
        val rules =
          if (row.isNullAt(rulesIdx)) Seq.empty[Rule]
          else row.getSeq[String](rulesIdx).map(decodeRule)
        val ok = isAllowed(rules, row.getString(pathIdx))
        val keep = (0 until row.length).filter(_ != rulesIdx).map(row.get)
        org.apache.spark.sql.Row.fromSeq(keep :+ ok)
      }
    }(enc)
  }
}
