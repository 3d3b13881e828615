package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Loaders for PUBLISHED tokenizer-vocabulary file formats, plus the
  * rank-map encoders that make a 50k-merge pretrained vocabulary
  * usable at corpus scale.
  *
  * Real training pipelines do not train a tokenizer per corpus — they
  * tokenize under a FIXED shipped vocabulary (GPT-2's
  * `vocab.json`/`merges.txt` pair, tiktoken's base64 `.tiktoken` rank
  * files). Three public formats (all documented in the openai/gpt-2
  * and openai/tiktoken repos; no vocabulary data is shipped here —
  * only parsers):
  *
  *   - `merges.txt`: optional `#version:` header, then one merge rule
  *     per line, `<left> <right>`, priority = line order.
  *   - `vocab.json`: a single JSON object, token string → integer id.
  *     Token strings use the bytes→unicode alphabet
  *     ([[Bpe.byteToUnicode]]) and JSON string escapes.
  *   - `.tiktoken`: one `base64(token_bytes) <rank>` pair per line.
  *
  * Encode algorithms (both row-local, the merge table ships in the
  * task closure — bounded by vocab size, never shuffled):
  *
  *   - [[encodeWordMerges]]: classic BPE — repeatedly merge the
  *     adjacent pair with the lowest merge-rule rank. O(n²) in the
  *     pre-token length with an O(1) rank lookup per adjacent pair,
  *     independent of vocabulary size — [[Bpe.encodeWord]]'s
  *     rank-ordered fixpoint pass is O(k·n) in the k merge rules,
  *     fine for gate-sized k but not for 50,000. For a well-formed
  *     merge list (each rule's sides are base symbols or earlier
  *     results — true of every published vocabulary) the two are
  *     equivalent: a merge only creates LONGER symbols, so applying
  *     rule r can never create a pair an earlier rule matches
  *     (PretrainedVocabSpec pins the equivalence on trained lists).
  *   - [[encodeWordVocabRanks]]: tiktoken's formulation — repeatedly
  *     merge the adjacent pair whose CONCATENATION has the lowest
  *     vocabulary rank. Equal to classic BPE when merged-token rank
  *     order equals merge creation order (how every published rank
  *     file is built).
  *
  * Reference scope: extension tier (lithops-dataframe has no
  * tokenizer surface); the trained-BPE machinery these loaders feed
  * is `Bpe.scala`.
  */
object PretrainedVocab {

  // ---- merges.txt -------------------------------------------------------

  /** Parse GPT-2 `merges.txt` content: `#`-prefixed header lines and
    * blank lines are skipped; every other line must be exactly
    * `<left> <right>`; rank = order of appearance. */
  def parseMergesTxt(text: String): Seq[Bpe.Merge] = {
    val out = Seq.newBuilder[Bpe.Merge]
    var rank = 0
    text.linesIterator.foreach { raw =>
      val line = raw.stripLineEnd
      if (line.nonEmpty && !line.startsWith("#")) {
        val sp = line.indexOf(' ')
        require(sp > 0 && sp < line.length - 1 && line.indexOf(' ', sp + 1) < 0,
          s"malformed merges.txt line ${rank + 1}: '$line'")
        out += Bpe.Merge(rank, line.substring(0, sp), line.substring(sp + 1))
        rank += 1
      }
    }
    out.result()
  }

  /** Render the inverse of [[parseMergesTxt]] (for fixtures and gates:
    * serialize → parse must be identity). */
  def renderMergesTxt(merges: Seq[Bpe.Merge]): String =
    ("#version: 0.2" +: merges.sortBy(_.rank).map(m => s"${m.left} ${m.right}"))
      .mkString("", "\n", "\n")

  // ---- vocab.json -------------------------------------------------------

  /** Parse `vocab.json`: one JSON object mapping token strings to
    * integer ids. Minimal strict parser for exactly that shape —
    * handles all JSON string escapes (incl. `\\uXXXX` — GPT-2 keys
    * like `\\u0120the` use them heavily); anything else fails loudly. */
  def parseVocabJson(text: String): Map[String, Int] = {
    var i = 0
    def skipWs(): Unit = while (i < text.length && text.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      require(i < text.length && text.charAt(i) == c,
        s"vocab.json: expected '$c' at offset $i")
      i += 1
    }
    def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < text.length && text.charAt(i) != '"') {
        val c = text.charAt(i)
        if (c == '\\') {
          require(i + 1 < text.length, "vocab.json: truncated escape")
          text.charAt(i + 1) match {
            case '"' => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case '/' => sb += '/'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'u' =>
              require(i + 6 <= text.length, "vocab.json: truncated \\u escape")
              sb += Integer.parseInt(text.substring(i + 2, i + 6), 16).toChar
              i += 6
            case e => throw new IllegalArgumentException(
              s"vocab.json: unsupported escape '\\$e'")
          }
        } else { sb += c; i += 1 }
      }
      expect('"')
      sb.result()
    }
    def parseInt(): Int = {
      skipWs()
      val start = i
      if (i < text.length && text.charAt(i) == '-') i += 1
      while (i < text.length && text.charAt(i).isDigit) i += 1
      require(i > start && (text.charAt(start) != '-' || i > start + 1),
        s"vocab.json: expected integer at offset $start")
      text.substring(start, i).toInt
    }
    val out = Map.newBuilder[String, Int]
    expect('{')
    skipWs()
    if (i < text.length && text.charAt(i) == '}') { i += 1 }
    else {
      var more = true
      while (more) {
        val k = parseString()
        expect(':')
        out += k -> parseInt()
        skipWs()
        if (i < text.length && text.charAt(i) == ',') { i += 1; skipWs() }
        else { expect('}'); more = false }
      }
    }
    skipWs()
    require(i == text.length, s"vocab.json: trailing content at offset $i")
    out.result()
  }

  /** Render the inverse of [[parseVocabJson]] (ASCII-safe: non-ASCII
    * and control chars as `\\uXXXX`, the format GPT-2 ships). */
  def renderVocabJson(vocab: Seq[(String, Int)]): String = {
    def esc(s: String): String = {
      val sb = new StringBuilder
      s.foreach {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case c if c >= 0x20 && c < 0x7f => sb += c
        case c => sb ++= f"\\u${c.toInt}%04x"
      }
      sb.result()
    }
    vocab.map { case (t, id) => s""""${esc(t)}": $id""" }
      .mkString("{", ", ", "}")
  }

  // ---- .tiktoken --------------------------------------------------------

  /** Parse tiktoken's rank-file format: `base64(token_bytes) <rank>`
    * per line. Returns token → rank with the token expressed in the
    * bytes→unicode symbol alphabet (so it composes with
    * [[Bpe.initGpt2Symbols]] and friends). */
  def parseTiktoken(text: String): Map[String, Int] = {
    val out = Map.newBuilder[String, Int]
    var ln = 0
    text.linesIterator.foreach { raw =>
      ln += 1
      val line = raw.stripLineEnd
      if (line.nonEmpty) {
        val sp = line.indexOf(' ')
        require(sp > 0 && sp < line.length - 1,
          s".tiktoken line $ln: expected 'base64 rank', got '$line'")
        val bytes = java.util.Base64.getDecoder.decode(line.substring(0, sp))
        val rank = line.substring(sp + 1).toInt
        val sym = new StringBuilder
        bytes.foreach(b => sym ++= Bpe.byteToUnicode(b & 0xff))
        out += sym.result() -> rank
      }
    }
    out.result()
  }

  /** Render the inverse of [[parseTiktoken]]: symbols (bytes→unicode
    * alphabet) back to raw bytes, base64'd, one per line. */
  def renderTiktoken(entries: Seq[(String, Int)]): String =
    entries.map { case (sym, rank) =>
      val bytes = sym.map(ch => Bpe.unicodeToByte(ch).toByte).toArray
      s"${java.util.Base64.getEncoder.encodeToString(bytes)} $rank"
    }.mkString("", "\n", "\n")

  // ---- rank-map encoders ------------------------------------------------

  /** Classic BPE encode against a pair-rank map: repeatedly merge the
    * adjacent pair with the lowest rank until none is mergeable.
    * O(len²) with O(1) lookups — vocabulary-size independent. */
  def encodeWordMerges(syms0: Array[String],
      pairRank: java.util.HashMap[String, java.lang.Integer]): Array[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.from(syms0)
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = pairRank.get(syms(i) + "\u0000" + syms(i + 1))
        if (r != null && r.intValue() < best) { best = r.intValue(); bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        syms(bi) = syms(bi) + syms(bi + 1)
        syms.remove(bi + 1)
        if (syms.length < 2) done = true
      }
    }
    syms.toArray
  }

  /** Build the pair-rank map [[encodeWordMerges]] consumes. */
  def pairRankMap(merges: Seq[Bpe.Merge]): java.util.HashMap[String, java.lang.Integer] = {
    val m = new java.util.HashMap[String, java.lang.Integer](merges.size * 2)
    merges.foreach(mg => m.put(mg.left + "\u0000" + mg.right, mg.rank))
    m
  }

  /** tiktoken-style encode: repeatedly merge the adjacent pair whose
    * CONCATENATION has the lowest vocabulary rank. Symbols whose
    * concatenation is absent from the vocabulary never merge. */
  def encodeWordVocabRanks(syms0: Array[String],
      rank: java.util.HashMap[String, java.lang.Integer]): Array[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.from(syms0)
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + syms(i + 1))
        if (r != null && r.intValue() < best) { best = r.intValue(); bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        syms(bi) = syms(bi) + syms(bi + 1)
        syms.remove(bi + 1)
        if (syms.length < 2) done = true
      }
    }
    syms.toArray
  }

  // ---- frame ops --------------------------------------------------------

  /** Per-doc token counts under a LOADED merge list, GPT-2
    * pre-tokenization, via the rank-map encoder. Row-local: the rank
    * map is built once per partition from the broadcast merge list. */
  def tokenCountsMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Bpe.Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rk = pairRankMap(merges)
        it.map { case (id, text) =>
          var n = 0L
          Bpe.gpt2Split(text).foreach { w =>
            n += encodeWordMerges(Bpe.initGpt2Symbols(w), rk).length
          }
          (id, n)
        }
      }
      .toDF(idCol, "n_tokens")
  }

  /** Per-doc token COUNT + token-ID SUM under a LOADED merge list and
    * id table — what a real pipeline materializes is the id sequence,
    * so the gate pins ids, not just counts. Row-local; unknown symbols
    * fail loudly (an id table must cover its own vocabulary). */
  def tokenIdSums(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Bpe.Merge], ids: Map[String, Int]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rk = pairRankMap(merges)
        it.map { case (id, text) =>
          var n = 0L
          var sum = 0L
          Bpe.gpt2Split(text).foreach { w =>
            encodeWordMerges(Bpe.initGpt2Symbols(w), rk).foreach { sym =>
              val tid = ids.getOrElse(sym, throw new IllegalArgumentException(
                s"symbol '$sym' missing from the id table"))
              n += 1
              sum += tid
            }
          }
          (id, n, sum)
        }
      }
      .toDF(idCol, "n_tokens", "id_sum")
  }

  /** Per-doc token counts under a LOADED `.tiktoken`-style rank table,
    * GPT-2 pre-tokenization, via the merged-rank encoder. */
  def tokenCountsVocabRanks(docs: DataFrame, idCol: String, textCol: String,
      ranks: Map[String, Int]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rk = new java.util.HashMap[String, java.lang.Integer](ranks.size * 2)
        ranks.foreach { case (k, v) => rk.put(k, v) }
        it.map { case (id, text) =>
          var n = 0L
          Bpe.gpt2Split(text).foreach { w =>
            n += encodeWordVocabRanks(Bpe.initGpt2Symbols(w), rk).length
          }
          (id, n)
        }
      }
      .toDF(idCol, "n_tokens")
  }
}
