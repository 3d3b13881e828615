package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Provenance-hygiene sweep over `src/` — proves the library is built
  * from PUBLIC knowledge only by grepping every source file for the
  * categories a leaked-internal dependency would show up as: non-public
  * imports, corporate URLs/buckets, chat links, credentials,
  * environment variables of non-public infrastructure.
  *
  * The artifact stamps its own provenance (run timestamp + git HEAD +
  * file/line counts) so a regenerated `LEAKCHECK.json` is
  * distinguishable from a hand edit — the round-8 advisory.
  *
  * Usage: runMain graft.tools.LeakCheck [outPath]
  * Exit code 1 on any hit.
  */
object LeakCheck {

  /** category → regex. Patterns target PUBLIC-vs-NON-PUBLIC provenance,
    * not style: the import allowlist is the public Spark/JDK/Scala
    * surface plus this repo's own package. */
  /** (name, regex, applies-to-path predicate). */
  private val Checks: Seq[(String, String, String => Boolean)] = Seq(
    // TLD-rooted imports outside the public Spark/test surface (local
    // val-imports like `spark.implicits._` are not TLD-rooted and the
    // repo's own `graft.*` is not a TLD)
    // org.apache.avro, org.apache.parquet and org.xerial.snappy are
    // PUBLIC packages already on the Spark classpath, allowed as
    // independent CROSS-ORACLES in the SPEC SUITE ONLY — so the
    // exemption is scoped to src/test, and a parquet-mr/avro/snappy
    // import appearing in src/main IS flagged (round-16 ADVICE item 3:
    // the 'no parquet-mr on the main classpath' invariant must be
    // machine-checked, not a comment)
    ("internal-import",
      """^\s*import\s+(?:com|net|io|ai|dev|internal)\.[\w.]+|^\s*import\s+org\.(?!apache\.spark|apache\.hadoop|apache\.avro|apache\.parquet|xerial\.snappy|scalatest|scalacheck)[\w.]+""",
      (f: String) => f.replace('\\', '/').contains("src/test/")),
    ("internal-import-main",
      """^\s*import\s+(?:com|net|io|ai|dev|internal)\.[\w.]+|^\s*import\s+org\.(?!apache\.spark|apache\.hadoop|scalatest|scalacheck)[\w.]+""",
      (f: String) => f.replace('\\', '/').contains("src/main/")),
    // URLs whose HOST carries non-public-infrastructure signals; the
    // synthetic RFC-2606-style fixtures in the URL-op tests
    // (example.com, a.com, bad.com, bbc.co.uk …) are public by
    // construction and deliberately not flagged
    ("internal-url",
      """https?://[A-Za-z0-9.-]*(?:corp|internal|intranet|intra\.|vpn\.|staging\.|\.local\b|console\.(?:aws|cloud)|okta)[A-Za-z0-9.-]*""",
      (_: String) => true),
    ("internal-pkg2",
      """(?:com|net|io)\.(?:google\.internal|corp|intra)[.\w]*""",
      (_: String) => true),
    ("internal-bucket",
      """(?:s3a?|gs|wasbs?|abfss?)://[A-Za-z0-9._-]+""",
      (_: String) => true),
    ("slack-link",
      """(?:slack\.com/archives|app\.slack\.com|#[a-z0-9-]*-(?:eng|infra|oncall)\b)""",
      (_: String) => true),
    ("api-key",
      """(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|api[_-]?key\s*[:=]\s*["'][A-Za-z0-9]{16,})""",
      (_: String) => true),
    ("axon-env",
      """sys\.env\(["'](?!SPARK_GRAFT_)[A-Z0-9_]+["']\)""",
      (_: String) => true))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("LEAKCHECK.json")
    val roots = Seq("src/main", "src/test")
    val files: Seq[Path] = roots.flatMap { r =>
      val p = Paths.get(r)
      if (!Files.exists(p)) Nil
      else {
        val walk = Files.walk(p)
        try walk.iterator().asScala
          .filter(f => f.toString.endsWith(".scala"))
          .toSeq
        finally walk.close()
      }
    }
    // read each file exactly once; all regexes run over the in-memory lines
    val contents: Seq[(Path, Seq[String])] =
      files.map(f => f -> Files.readAllLines(f).asScala.toSeq)
    val nLines: Long = contents.map(_._2.size.toLong).sum
    val hits: Map[String, Seq[String]] = Checks.map { case (name, pattern, applies) =>
      val re = pattern.r
      val found = contents.flatMap { case (f, lines) =>
        if (!applies(f.toString)) Nil
        else lines.iterator.zipWithIndex.collect {
          case (line, i) if re.findFirstIn(line).isDefined =>
            s"$f:${i + 1}: ${line.trim.take(160)}"
        }
      }
      name -> found
    }.toMap
    val head = Provenance.gitHead
    val dirty = Provenance.gitTreeDirty
    val ts = java.time.Instant.now().toString
    val nHits = hits.values.map(_.size).sum
    def arr(xs: Seq[String]) = xs.map(graft.JsonOut.q).mkString("[", ",", "]")
    val json =
      s"""{
         |  "generated_by": "graft.tools.LeakCheck",
         |  "run_at": ${graft.JsonOut.q(ts)},
         |  "git_head": ${graft.JsonOut.q(head)},
         |  "git_tree_dirty": $dirty,
         |  "n_files": ${files.size},
         |  "n_lines": $nLines,
         |  "n_hits": $nHits,
         |  "hits": {
         |${Checks.map { case (n, _, _) => s"""    ${graft.JsonOut.q(n)}: ${arr(hits(n))}""" }.mkString(",\n")}
         |  }
         |}
         |""".stripMargin
    Files.writeString(Paths.get(out), json)
    println(json)
    if (nHits > 0) sys.exit(1)
  }
}
