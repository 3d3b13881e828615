package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist scanning via an Aho-Corasick automaton
  * (Aho & Corasick 1975, public algorithm) — the C4-style badlist /
  * policy-term filter stage of a curation pipeline.
  *
  * Why an automaton and not `contains` per term: a naive scan is
  * O(K·n) per document for K patterns; Aho-Corasick is O(n + hits)
  * after a one-time O(total pattern chars) build — at a 10⁴-term
  * blocklist over 100 TB of text, that factor is the difference
  * between one pass and ten thousand. The automaton is built ONCE on
  * the driver and ships to executors in the task closure (size ∝
  * total pattern characters, independent of the corpus).
  *
  * Matching semantics (oracle-replayable): case-insensitive SUBSTRING
  * occurrences — "slowly" matches the pattern "slow"; ALL occurrences
  * count, including overlapping ones and patterns that are suffixes
  * of other patterns' matches (the standard AC output-link behavior,
  * pinned by unit test; the SQL oracle's replace-arithmetic counts
  * non-overlapping occurrences, so gate patterns are chosen
  * self-overlap-free, where both counts coincide — word-like terms
  * always are).
  */
object Blocklist {

  /** Immutable matching automaton. Nodes are dense ints; transitions
    * are per-node sorted char/next arrays (binary-searched — compact
    * and serialization-friendly); `fail` is the standard BFS failure
    * function; `outCount`/`outTerms` carry the output sets merged
    * through fail links at build time, so scanning never walks fail
    * chains per position. */
  final class Automaton private[Blocklist] (
      private val chars: Array[Array[Char]],
      private val next: Array[Array[Int]],
      private val fail: Array[Int],
      private val outCount: Array[Int],
      private val outTerms: Array[Array[Int]],
      val nPatterns: Int) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (true) {
        val i = java.util.Arrays.binarySearch(chars(s), c)
        if (i >= 0) return next(s)(i)
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }

    /** Total pattern occurrences in `text` (lowercased scan). */
    def countMatches(text: String): Long = {
      var s = 0
      var n = 0L
      var i = 0
      while (i < text.length) {
        s = step(s, Character.toLowerCase(text.charAt(i)))
        n += outCount(s)
        i += 1
      }
      n
    }

    /** Distinct pattern ids present in `text`. */
    def matchedTerms(text: String): Array[Int] = {
      val seen = new java.util.BitSet(nPatterns)
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, Character.toLowerCase(text.charAt(i)))
        val ts = outTerms(s)
        var j = 0
        while (j < ts.length) { seen.set(ts(j)); j += 1 }
        i += 1
      }
      val out = new Array[Int](seen.cardinality())
      var b = seen.nextSetBit(0)
      var k = 0
      while (b >= 0) { out(k) = b; k += 1; b = seen.nextSetBit(b + 1) }
      out
    }
  }

  /** Build the automaton: trie insert (patterns lowercased,
    * duplicates and empties rejected loudly), BFS failure links,
    * output sets merged through fail targets. */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "empty blocklist")
    val pats = patterns.map(_.toLowerCase)
    require(pats.forall(_.nonEmpty), "blocklist patterns must be non-empty")
    require(pats.distinct.size == pats.size,
      "duplicate blocklist patterns (after lowercasing)")
    // trie with growable per-node maps, frozen to sorted arrays below
    val trieChars = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        trieChars(s).get(c) match {
          case Some(t) => s = t
          case None =>
            trieChars += scala.collection.mutable.TreeMap.empty[Char, Int]
            ends += Nil
            trieChars(s)(c) = trieChars.size - 1
            s = trieChars.size - 1
        }
      }
      ends(s) = pi :: ends(s)
    }
    val n = trieChars.size
    val chars = Array.tabulate(n)(i => trieChars(i).keys.toArray)
    val next = Array.tabulate(n)(i => trieChars(i).values.toArray)
    val fail = new Array[Int](n)
    val outTerms = Array.tabulate(n)(i => ends(i).toArray.sorted)
    // BFS: depth-1 nodes fail to root; deeper nodes follow the
    // parent's fail chain; outputs merge from the fail target
    val queue = scala.collection.mutable.Queue.empty[Int]
    chars(0).indices.foreach { i => fail(next(0)(i)) = 0; queue += next(0)(i) }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      chars(s).indices.foreach { i =>
        val c = chars(s)(i)
        val t = next(s)(i)
        var f = fail(s)
        var resolved = -1
        while (resolved < 0) {
          val j = java.util.Arrays.binarySearch(chars(f), c)
          if (j >= 0) resolved = next(f)(j)
          else if (f == 0) resolved = 0
          else f = fail(f)
        }
        fail(t) = resolved
        outTerms(t) = (outTerms(t) ++ outTerms(resolved)).distinct.sorted
        queue += t
      }
    }
    val outCount = outTerms.map(_.length)
    new Automaton(chars, next, fail, outCount, outTerms, pats.size)
  }

  /** docs(idCol, textCol) → + (n_hits, n_terms, clean): total
    * occurrences, distinct matched patterns, and the keep flag.
    * Row-local single pass; the automaton ships once per task
    * binary. */
  def annotate(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ac = build(patterns)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val t = Option(text).getOrElse("")
        val hits = ac.countMatches(t)
        val terms = ac.matchedTerms(t).length
        (id, hits, terms.toLong, hits == 0L)
      })
      .toDF(idCol, "n_hits", "n_terms", "clean")
  }

  /** Keep only documents with zero blocklist hits. */
  def filterClean(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val flagged = annotate(docs, idCol, textCol, patterns)
      .select(col(idCol), col("clean"))
    docs.join(flagged.where(col("clean")).drop("clean"), Seq(idCol))
  }
}
