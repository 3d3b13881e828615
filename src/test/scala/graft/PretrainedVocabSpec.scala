package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, PretrainedVocab => PV}

/** Pins for the published tokenizer-vocabulary formats and the
  * rank-map encoders. The equivalence tests build WELL-FORMED merge
  * lists with a tiny in-memory BPE trainer (same pair-count + argmax
  * rule as `Bpe.train`, no Spark), so they hold for exactly the class
  * of lists published vocabularies belong to. */
class PretrainedVocabSpec extends AnyFunSuite {

  /** In-memory byte-level BPE trainer over a word list: k rounds of
    * (most frequent pair, ties lexicographic) — the well-formed merge
    * lists the loaders consume. */
  private def trainInMemory(words: Seq[String], k: Int): Seq[Bpe.Merge] = {
    var seqs = words.map(w => Bpe.encodeWord(w, Nil, Bpe.initGpt2Symbols _))
    val out = Seq.newBuilder[Bpe.Merge]
    for (rank <- 0 until k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { s =>
        for (i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + 1L
      }
      if (counts.nonEmpty) {
        val ((l, r), _) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += Bpe.Merge(rank, l, r)
        seqs = seqs.map(s => Bpe.applyMerge(s, l, r))
      }
    }
    out.result()
  }

  private val corpus = Seq(
    " the", " then", " there", " other", " in", " inner", " and", " sand",
    "the", "thin", "train", "data", " data", " training", " pipeline",
    " tokenizer", " merges", " vocab", "12345", " 987", "don't", " it's")

  test("merges.txt render -> parse is identity (header + rank order)") {
    val ms = trainInMemory(corpus, 12)
    assert(ms.size == 12)
    val txt = PV.renderMergesTxt(ms)
    assert(txt.startsWith("#version: 0.2\n"))
    assert(PV.parseMergesTxt(txt) == ms)
  }

  test("merges.txt parses the published GPT-2 shape (Ġ space symbol, blanks)") {
    // The real gpt-2 merges.txt begins with rules over the Ġ (U+0120)
    // leading-space symbol — format knowledge, not shipped data.
    val sample = "#version: 0.2\nĠ t\nĠ a\nh e\ni n\nr e\n\nĠt he\n"
    val ms = PV.parseMergesTxt(sample)
    assert(ms.size == 6)
    assert(ms.head == Bpe.Merge(0, "Ġ", "t"))
    assert(ms(5) == Bpe.Merge(5, "Ġt", "he"))
    // malformed lines fail loudly
    intercept[IllegalArgumentException](PV.parseMergesTxt("a b c\n"))
    intercept[IllegalArgumentException](PV.parseMergesTxt("abc\n"))
  }

  test("vocab.json render -> parse is identity incl. escapes") {
    val vocab = Seq(
      "Ġthe" -> 262, "in" -> 259, "\"quoted\"" -> 1,
      "back\\slash" -> 2, "tab\there" -> 3, "éĊ" -> 4)
    val txt = PV.renderVocabJson(vocab)
    // ASCII-safe rendering: the Ġ key must appear as Ġ
    assert(txt.contains("\\u0120the"))
    assert(PV.parseVocabJson(txt) == vocab.toMap)
    // published-shape sample parses
    assert(PV.parseVocabJson("""{"!": 0, "Ġt": 256, "Ġthe": 262}""") ==
      Map("!" -> 0, "Ġt" -> 256, "Ġthe" -> 262))
    intercept[IllegalArgumentException](PV.parseVocabJson("""{"a": 1"""))
    intercept[IllegalArgumentException](PV.parseVocabJson("""{"a": 1} extra"""))
  }

  test(".tiktoken render -> parse is identity incl. multi-byte tokens") {
    // symbols in the bytes->unicode alphabet, incl. a UTF-8 e-acute
    // (0xC3 0xA9) and the Ġ space byte
    val eAcute = Bpe.byteToUnicode(0xC3) + Bpe.byteToUnicode(0xA9)
    val entries = Seq("the" -> 0, "Ġthe" -> 1, eAcute + "t" -> 2)
    val txt = PV.renderTiktoken(entries)
    assert(PV.parseTiktoken(txt) == entries.toMap)
    // hand sample: base64("the") = dGhl
    assert(PV.parseTiktoken("dGhl 42\n") == Map("the" -> 42))
    // base64(0x20 0x74) = " t" -> space byte maps to Ġ
    assert(PV.parseTiktoken("IHQ= 7\n") == Map("Ġt" -> 7))
    intercept[IllegalArgumentException](PV.parseTiktoken("noRank\n"))
  }

  test("rank-map encoder == rank-ordered fixpoint encoder on trained lists") {
    val ms = trainInMemory(corpus, 16)
    val rk = PV.pairRankMap(ms)
    val probes = corpus ++ Seq(" thereafter", " insider", " sandstone",
      " untrained", "t", "", " ", " zzz", " the the")
    for (w <- probes) {
      val classic = Bpe.encodeWord(w, ms, Bpe.initGpt2Symbols _)
      val fast = PV.encodeWordMerges(Bpe.initGpt2Symbols(w), rk)
      assert(fast.toSeq == classic.toSeq, s"word '$w'")
    }
  }

  test("tiktoken-rank encoder == classic BPE when ranks follow creation order") {
    val ms = trainInMemory(corpus, 16)
    // vocabulary ranks: 256 base symbols first (any order below all
    // merged tokens), merged tokens at 256 + merge rank
    val rk = new java.util.HashMap[String, java.lang.Integer]()
    for (b <- 0 until 256) rk.put(Bpe.byteToUnicode(b), b)
    ms.foreach(m => rk.put(m.merged, 256 + m.rank))
    val probes = corpus ++ Seq(" thereafter", " insider", " sandstone")
    for (w <- probes) {
      val classic = Bpe.encodeWord(w, ms, Bpe.initGpt2Symbols _)
      val viaRanks = PV.encodeWordVocabRanks(Bpe.initGpt2Symbols(w), rk)
      assert(viaRanks.toSeq == classic.toSeq, s"word '$w'")
    }
  }
  test("mutation fuzz: corrupt vocab files fail with IllegalArgumentException, never hang") {
    import java.nio.charset.StandardCharsets.UTF_8
    val merges = trainInMemory(corpus, 24)
    val vocab = merges.zipWithIndex.map { case (m, i) => (m.left + m.right, 256 + i) }
    val fixtures: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("merges.txt", PV.renderMergesTxt(merges).getBytes(UTF_8),
        b => PV.parseMergesTxt(new String(b, UTF_8))),
      ("vocab.json", PV.renderVocabJson(vocab).getBytes(UTF_8),
        b => PV.parseVocabJson(new String(b, UTF_8))),
      (".tiktoken", PV.renderTiktoken(vocab).getBytes(UTF_8),
        b => PV.parseTiktoken(new String(b, UTF_8))))
    val rnd = new java.util.Random(20261816L)
    for ((name, good, parse) <- fixtures) {
      // bit flips
      for (trial <- 1 to 800) {
        val m = good.clone()
        for (_ <- 0 to rnd.nextInt(3)) {
          val i = rnd.nextInt(m.length)
          m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
        }
        try { parse(m); () }
        catch {
          case _: IllegalArgumentException => ()
          case e: Throwable =>
            fail(s"$name trial $trial leaked ${e.getClass.getName}: ${e.getMessage}")
        }
      }
      // every truncation point
      for (cut <- 0 until good.length) {
        try { parse(java.util.Arrays.copyOf(good, cut)); () }
        catch {
          case _: IllegalArgumentException => ()
          case e: Throwable =>
            fail(s"$name truncated at $cut leaked ${e.getClass.getName}: ${e.getMessage}")
        }
      }
    }
  }
}
