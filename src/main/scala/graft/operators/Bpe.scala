package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding (Sennrich et
  * al. 2016, public algorithm) as distributed operators — "train the
  * tokenizer on the cluster" is a standard step of a large-scale
  * pretraining pipeline.
  *
  * Scale shape: ONE corpus-wide shuffle builds the distinct-word
  * frequency table (vocab-sized, not corpus-sized); every merge round
  * then runs one grouped aggregation over that word table plus a
  * 1-row argmax collect — k merges cost k vocab-table shuffles and
  * k driver rows, never a second corpus pass. Encoding is row-local
  * with the merge list broadcast.
  *
  * Deterministic spec (oracle-replayable):
  *  - pre-tokenize with [[TextOps.tokens]] (lowercase, whitespace
  *    split, empties dropped); a word is its characters plus a
  *    terminal `</w>` symbol;
  *  - each round counts adjacent symbol pairs weighted by word
  *    frequency; the winner is max count, ties broken by the pair's
  *    lexicographic `"left right"` form (ascending);
  *  - a merge applies as repeated left-to-right single passes until
  *    fixpoint — equivalently, until no adjacent (left, right)
  *    remains; the merged symbol is `left + right`;
  *  - encoding applies the merge list in rank order, each rule to
  *    fixpoint. Deterministic by construction, no RNG anywhere.
  */
object Bpe {

  /** One learned merge: rank is 0-based priority order. */
  final case class Merge(rank: Int, left: String, right: String) {
    def merged: String = left + right
  }

  /** Single left-to-right merge pass; returns null when nothing
    * merged (avoids allocating for the common stable case). */
  private def mergeOnce(syms: Array[String], left: String, right: String): Array[String] = {
    var i = 0
    var hit = false
    while (i < syms.length - 1 && !hit) {
      if (syms(i) == left && syms(i + 1) == right) hit = true else i += 1
    }
    if (!hit) null
    else {
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length - 1)
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == left && syms(j + 1) == right) {
          out += left + right
          j += 2
        } else {
          out += syms(j)
          j += 1
        }
      }
      out.toArray
    }
  }

  /** Apply one merge rule to fixpoint. */
  private[graft] def applyMerge(syms: Array[String], left: String, right: String): Array[String] = {
    var cur = syms
    var next = mergeOnce(cur, left, right)
    while (next != null) { cur = next; next = mergeOnce(cur, left, right) }
    cur
  }

  /** Initial symbol sequence of a word. */
  private[graft] def initSymbols(w: String): Array[String] =
    w.toCharArray.map(_.toString) :+ "</w>"

  /** Distinct-word frequency table of a corpus column — the ONE
    * corpus-wide shuffle. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn `k` merges. Each round: pair-count aggregation over the
    * word table + a deterministic 1-row argmax collect. The word
    * table is cached; per-round lineage is cut with localCheckpoint
    * so round r does not replay rounds 1..r-1. */
  def train(docs: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k >= 1, s"need at least one merge, got $k")
    var seqs: Dataset[(Array[String], Long)] =
      wordFreqs(docs, textCol).as[(String, Long)]
        .map { case (w, f) => (initSymbols(w), f) }
    seqs = seqs.localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var r = 0
    while (r < k) {
      val top = seqs.flatMap { case (syms, f) =>
        (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), f))
      }
        .toDF("left", "right", "freq")
        .groupBy("left", "right").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, concat_ws(" ", col("left"), col("right")).asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      require(top.nonEmpty, s"round $r: no adjacent pairs left to merge")
      val (l, rr, _) = top.head
      out += Merge(r, l, rr)
      val prev = seqs
      seqs = seqs.map { case (syms, f) => (applyMerge(syms, l, rr), f) }.localCheckpoint()
      prev.unpersist()
      r += 1
    }
    seqs.unpersist()
    out.result()
  }

  /** Encode one word with a rank-ordered merge list (each rule to
    * fixpoint — see object doc). */
  def encodeWord(w: String, merges: Seq[Merge]): Array[String] = {
    var syms = initSymbols(w)
    merges.foreach(m => syms = applyMerge(syms, m.left, m.right))
    syms
  }

  /** docs(idCol, textCol) → (idCol, n_tokens): per-doc BPE token
    * count under the given merge list. Row-local; the merge list
    * ships in the closure (broadcast-by-task-binary, bounded: k
    * rows). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.sortBy(_.rank)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val words = Option(text).getOrElse("").toLowerCase.trim
          .split("\\s+").iterator.filter(_.nonEmpty)
        var n = 0L
        words.foreach(w => n += encodeWord(w, ms).length)
        (id, n)
      })
      .toDF(idCol, "n_tokens")
  }
}
