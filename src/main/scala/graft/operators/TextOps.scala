package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines: tokenization,
  * token counting, language ID, quality scoring, fingerprinting.
  *
  * Everything is built from codegen'd built-in functions (split,
  * higher-order array functions, regexp) — no UDFs, so these run inside
  * whole-stage codegen at full scan speed; all are row-local (zero
  * shuffles at any scale).
  */
object TextOps {

  /** Whitespace tokenization, lowercased. Empty tokens are filtered:
    * `split("", "\\s+")` yields `[""]`, which would otherwise count a
    * phantom token for empty/whitespace-only documents — exactly the
    * junk rows quality filters exist to catch. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, and single
    * non-alphanumeric marks counted separately (the shape GPT-style
    * pre-tokenizers produce, without a merges table). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  // Small high-frequency stopword sets per language. Public knowledge;
  // kept tiny so the SQL oracle can mirror them verbatim.
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "que", "y", "es"),
    "fr" -> Seq("le", "les", "une", "et", "est"))

  /** Number of tokens that hit a stopword set. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(stopwords(lang))))

  /** n-gram-heuristic language ID: stopword-hit votes per language,
    * argmax with a fixed priority order (en > de > es > fr), `unknown`
    * when nothing hits. Deliberately simple and exactly mirrorable in
    * SQL — the cheap first-pass filter. The TRAINED replacement behind
    * the same column contract is [[langIdTrain]]/[[langIdPredict]]
    * (CCNet's actual stage: a char-n-gram multi-class linear model). */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = stopwordHits(t, "en")
    val de = stopwordHits(t, "de")
    val es = stopwordHits(t, "es")
    val fr = stopwordHits(t, "fr")
    when(en >= greatest(de, es, fr) && en > 0, lit("en"))
      .when(de >= greatest(es, fr) && de > 0, lit("de"))
      .when(es >= fr && es > 0, lit("es"))
      .when(fr > 0, lit("fr"))
      .otherwise(lit("unknown"))
  }

  /** A trained language-ID model: the K-class linear model plus the
    * char-n-gram featurization it was trained with (ns/seed must match
    * between train and predict, so they travel together). */
  final case class LangIdModel(mc: MultiClass.McModel, ns: Seq[Int],
      numBuckets: Int, seed: Long)

  /** Presence (distinct) char-n-gram buckets: binary features keep the
    * common-gram count mass from drowning the discriminative grams —
    * the CCNet-style binarization [[QualityClassifier]] uses too. */
  private def langFeats(text: Column, ns: Seq[Int], numBuckets: Int,
      seed: Long): Column =
    array_distinct(
      graft.functions.CharGramBuckets.charGramBuckets(text, ns, numBuckets, seed))

  /** Train a char-n-gram language-ID model — CCNet's ACTUAL langid
    * stage (a fastText multi-class linear model over character
    * n-grams), replacing the [[langId]] stopword heuristic with a
    * TRAINED discriminator behind the same column contract.
    *
    * Rides [[MultiClass.train]]: one corpus scan + one
    * K·(numBuckets+1)-bounded gradient shuffle per round — at 100 TB
    * the corpus never moves. Labels come from `labelCol` (weak
    * supervision: a known-language slice, metadata, or the heuristic
    * itself — the CCNet bootstrap). */
  def langIdTrain(docs: DataFrame, textCol: String, labelCol: String,
      langs: Seq[String], numBuckets: Int = 256, ns: Seq[Int] = Seq(2),
      seed: Long = 13L, rounds: Int = 5, lr: Double = 0.25): LangIdModel =
    LangIdModel(
      MultiClass.train(docs, langFeats(col(textCol), ns, numBuckets, seed),
        labelCol, langs, numBuckets, rounds, lr),
      ns, numBuckets, seed)

  /** Score + predict with a trained langid model: adds
    * `score_<lang>` columns (6dp) and the argmax `predCol` (earliest
    * lang wins ties — the pinned priority order). `minScore > 0` adds
    * CCNet's confidence rejection: a document whose best score is
    * below the threshold predicts `unknown` instead of a guess (the
    * production langid contract — low-confidence pages are dropped or
    * routed to a heavier model, never silently mislabeled). The
    * comparison runs on the 6dp-ROUNDED scores, so the cut replays
    * bit-for-bit in any engine. Row-local. */
  def langIdPredict(docs: DataFrame, textCol: String, m: LangIdModel,
      predCol: String = "lang_pred", minScore: Double = 0.0): DataFrame = {
    val scored = MultiClass.scored(docs,
      langFeats(col(textCol), m.ns, m.numBuckets, m.seed), m.mc, predCol)
    if (minScore <= 0.0) scored
    else {
      val best = greatest(m.mc.labels.map(l => col(s"score_$l")): _*)
      scored.withColumn(predCol,
        when(best >= lit(minScore), col(predCol)).otherwise(lit("unknown")))
    }
  }

  /** Quality metrics struct: char/token counts, average token length,
    * stopword ratio, distinct-token ratio. The standard cheap filters a
    * 100 TB corpus pass runs before anything expensive.
    * avg_token_chars sums actual token lengths (robust to runs of
    * whitespace and leading/trailing space — a chars-minus-separators
    * shortcut is only right for single-spaced text); ratio metrics are
    * null for token-free documents rather than a fake 1.0. */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val t = tokens(text)
    val nChars = length(text)
    val nToks = size(t)
    val sumTokChars = aggregate(t, lit(0), (acc, x) => acc + length(x))
    def ratio(num: Column) =
      when(nToks > 0, round(num.cast(DoubleType) / nToks.cast(DoubleType), 6))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "avg_token_chars" -> ratio(sumTokChars),
      "stopword_ratio" -> ratio(stopwordHits(t, "en")),
      "distinct_ratio" -> ratio(size(array_distinct(t))))
  }

  /** Repetition signals — the Gopher-style quality heuristics (Rae et
    * al. 2021, "Scaling Language Models: Methods, Analysis & Insights
    * from Training Gopher", table A1 — public) that catch boilerplate
    * and crawler loops which slip past length/stopword filters:
    * fraction of duplicate lines, fraction of characters inside
    * duplicate lines, and duplicate word-n-gram fractions (n = 2, 3).
    *
    * "Duplicate fraction" counts EXCESS occurrences: 1 − distinct/total,
    * so a document whose every line appears exactly twice scores 0.5.
    * Fractions are null when the document has no lines / too few tokens
    * (the junk-row convention [[qualityMetrics]] uses).
    *
    * All row-local single-pass expressions (split / shingle + distinct),
    * zero shuffles at any scale; n-grams keep multiplicity via
    * [[graft.functions.WordNGrams.wordNGramsAll]] — the distinct
    * shingle path would hide exactly the repetition being measured. */
  def repetitionMetrics(text: Column): Seq[(String, Column)] = {
    val lines = filter(transform(split(text, "\n"), l => trim(l, " \t\r")), l => length(l) > 0)
    val dLines = array_distinct(lines)
    def chars(arr: Column) = aggregate(arr, lit(0), (a, x) => a + length(x))
    def frac(num: Column, den: Column) =
      when(den > 0, round(num.cast(DoubleType) / den.cast(DoubleType), 6))
    def dupFrac(all: Column) = frac(size(all) - size(array_distinct(all)), size(all))
    Seq(
      "dup_line_frac" -> frac(size(lines) - size(dLines), size(lines)),
      "dup_line_char_frac" -> frac(chars(lines) - chars(dLines), chars(lines)),
      "dup_2gram_frac" -> dupFrac(graft.functions.WordNGrams.wordNGramsAll(text, 2)),
      "dup_3gram_frac" -> dupFrac(graft.functions.WordNGrams.wordNGramsAll(text, 3)))
  }

  /** 64-bit content fingerprint of normalized text (xxhash64 — stable
    * across executors/runs; the cheap equality key for exact dedup and
    * incremental recompute). */
  def fingerprint(text: Column): Column = xxhash64(lower(trim(text)))

  /** Winnowing-style rolling fingerprint: hash every word n-gram and
    * keep the per-document minimum k hashes (a deterministic sketch of
    * document content; near-dup docs share most sketch elements).
    * Returns `array<long>` of at most k. */
  def minKFingerprint(text: Column, n: Int = 3, k: Int = 8): Column = {
    val grams = Dedup.shingles(text, n)
    slice(array_sort(transform(grams, g => xxhash64(g))), 1, k)
  }

  /** Top-k TF-IDF terms per document: term frequency per (doc, term),
    * document frequency per term, smooth idf `ln((1+N)/(1+df)) + 1`,
    * then a per-doc top-k window (ties broken by term for determinism).
    *
    * Scale shape: ONE shuffle for the (doc, term) counts, ONE for the
    * term document-frequencies, and the per-doc window partitions by
    * doc id — millions of small partitions, no global sort. The
    * tf→dfreq join carries NO broadcast hint on purpose (same reasoning
    * as [[unigramLogProb]]): a clean vocabulary fits and AQE broadcasts
    * it at runtime, but a web-scale corpus's distinct-token table
    * (typos, ids, hashes) can run to billions of rows — past any
    * broadcast/driver cap — and a forced hint would OOM the driver
    * where the unhinted plan degrades gracefully to a shuffled hash
    * join on the term. The corpus size N is a driver-side scalar (one
    * count job), like any fitted-statistic parameter. */
  def tfIdfTopTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0)
    val n = docs.count()
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("tfidf",
        col("tf") * (log((lit(1.0) + n) / (lit(1.0) + col("df"))) + 1.0))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("tfidf"), col("rank"))
  }

  /** Unigram log-probability score per document — the classic cheap
    * LM-free fluency/quality signal (a document of globally-rare tokens
    * scores low; natural prose tracks the corpus distribution):
    * `mean over tokens of ln(count(token) / total_tokens)`, with the
    * unigram counts estimated from the corpus itself.
    *
    * Scale shape: ONE explode+groupBy shuffle builds the
    * vocabulary-sized frequency table, which joins back onto the
    * exploded tokens. The frequency join carries NO broadcast hint on
    * purpose: a clean vocabulary fits and AQE broadcasts it at runtime,
    * but a web-scale corpus's distinct-token table (typos, ids, hashes)
    * can run to billions of rows — past any broadcast/driver cap — and
    * a forced hint would OOM the driver where the unhinted plan just
    * degrades to a shuffled hash join on the token. Per-doc mean is a
    * second grouped aggregation on the doc id; the corpus token total
    * (one row, always safe) rides a broadcast crossJoin. Token-free
    * docs get a null score. */
  def unigramLogProb(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // total corpus tokens: a scalar agg over the vocab table —
    // computed once, attached as a literal via crossJoin of one row
    val total = freq.agg(sum("cnt").as("__total"))
    val scored = toks
      .join(freq, "tok")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        (log(col("cnt").cast(DoubleType)) - log(col("__total").cast(DoubleType)))
          .as("lp"))
    docs.select(col(idCol))
      .join(scored.groupBy(idCol).agg(avg("lp").as("unigram_logprob")), Seq(idCol), "left")
  }

  /** PII scrub: mask emails, URLs, and long digit runs (phone/account
    * numbers) with typed placeholder tokens. Three chained
    * `regexp_replace` — row-local codegen, no UDF; the standard
    * redaction pass a training corpus gets before anything is retained.
    * Patterns are deliberately simple and high-recall: over-masking an
    * ambiguous token is the safe failure mode for training data. */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^\\s]+", "<URL>")
    regexp_replace(url, "[0-9][0-9 ()\\-]{6,}[0-9]", "<NUMBER>")
  }

  /** Gopher stopword set (Rae et al. 2021, §A1.1: "contains at least
    * two of the following English words: the, be, to, of, and, that,
    * have, with" — public). Distinct words, not occurrences. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher document-quality rule set (Rae et al. 2021, table A1 —
    * public), composed from [[qualityMetrics]]/[[repetitionMetrics]]
    * signals plus the character-coverage n-gram stats
    * ([[graft.functions.GramStats]]). Returns (metric, column) pairs —
    * the measured value for each rule, so a pipeline can log WHY a
    * document was dropped, not just that it was:
    *
    *   - `n_tokens` — word count (rule: 50..100,000)
    *   - `avg_token_chars` — mean word length (rule: 3..10)
    *   - `symbol_ratio` — (`#` + `...` occurrences) / words (rule: ≤ 0.1)
    *   - `bullet_line_frac` — lines starting with a bullet (rule: ≤ 0.9)
    *   - `ellipsis_line_frac` — lines ending in `...` (rule: ≤ 0.3)
    *   - `alpha_word_frac` — words containing ≥1 alphabetic char
    *     (rule: ≥ 0.8)
    *   - `gopher_stopword_hits` — distinct hits in [[gopherStopwords]]
    *     (rule: ≥ 2)
    *   - `dup_line_frac` / `dup_line_char_frac` — from
    *     [[repetitionMetrics]] (rules: ≤ 0.30 / ≤ 0.20)
    *   - `top_2gram_char_frac` — most-repeated 2-gram char coverage
    *     (rule: ≤ 0.20)
    *   - `dup_5gram_char_frac` — repeated-5-gram char coverage
    *     (rule: ≤ 0.15)
    *
    * Everything is row-local (zero shuffles at any scale); the n-gram
    * stats run as single-pass native expressions. Ratio metrics follow
    * the null-for-empty convention of [[qualityMetrics]]. */
  def gopherMetrics(text: Column): Seq[(String, Column)] = {
    val t = tokens(text)
    val nToks = size(t)
    def ratio(num: Column) =
      when(nToks > 0, round(num.cast(DoubleType) / nToks.cast(DoubleType), 6))
    val lines = filter(transform(split(text, "\n"), l => trim(l, " \t\r")), l => length(l) > 0)
    val nLines = size(lines)
    def lineFrac(num: Column) =
      when(nLines > 0, round(num.cast(DoubleType) / nLines.cast(DoubleType), 6))
    val sumTokChars = aggregate(t, lit(0), (acc, x) => acc + length(x))
    val nSymbols =
      size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0)))
    val bulletLines =
      size(filter(lines, l => l.rlike("^[\\-\\*•‣▪]")))
    val ellipsisLines = size(filter(lines, l => l.endsWith("...")))
    val alphaWords = size(filter(t, w => w.rlike("[a-z]")))
    val stopHits =
      size(filter(lit(gopherStopwords.toArray), sw => array_contains(t, sw)))
    val rep = repetitionMetrics(text).toMap
    Seq(
      "n_tokens" -> nToks,
      "avg_token_chars" ->
        when(nToks > 0, round(sumTokChars.cast(DoubleType) / nToks.cast(DoubleType), 6)),
      "symbol_ratio" -> ratio(nSymbols),
      "bullet_line_frac" -> lineFrac(bulletLines),
      "ellipsis_line_frac" -> lineFrac(ellipsisLines),
      "alpha_word_frac" -> ratio(alphaWords),
      "gopher_stopword_hits" -> stopHits,
      "dup_line_frac" -> rep("dup_line_frac"),
      "dup_line_char_frac" -> rep("dup_line_char_frac"),
      "top_2gram_char_frac" ->
        round(graft.functions.GramStats.topNGramCharFrac(text, 2), 6),
      "dup_5gram_char_frac" ->
        round(graft.functions.GramStats.dupNGramCharFrac(text, 5), 6))
  }

  /** Boolean keep/drop verdict under the Gopher thresholds (table A1).
    * A null metric (empty/too-short document structure) fails only the
    * rules whose null CAUSE is disqualifying — a token-free document
    * already fails the word-count rule; a document with no lines
    * trivially passes the line-shape rules (there are no bullet lines).
    * Null-safe: every threshold comparison coalesces to its pass
    * default before the conjunction, so the verdict is never null. */
  def gopherKeep(text: Column): Column = {
    val m = gopherMetrics(text).toMap
    def atMost(c: Column, x: Double) = coalesce(c <= x, lit(true))
    m("n_tokens").between(50, 100000) &&
      coalesce(m("avg_token_chars").between(3.0, 10.0), lit(false)) &&
      atMost(m("symbol_ratio"), 0.1) &&
      atMost(m("bullet_line_frac"), 0.9) &&
      atMost(m("ellipsis_line_frac"), 0.3) &&
      coalesce(m("alpha_word_frac") >= 0.8, lit(false)) &&
      m("gopher_stopword_hits") >= 2 &&
      atMost(m("dup_line_frac"), 0.30) &&
      atMost(m("dup_line_char_frac"), 0.20) &&
      atMost(m("top_2gram_char_frac"), 0.20) &&
      atMost(m("dup_5gram_char_frac"), 0.15)
  }

  /** C4-style page cleaning (Raffel et al. 2020, §2.2 — public): the
    * line- and document-level heuristics that turned Common Crawl into
    * C4, as row-local columns.
    *
    * Line level — a line survives iff it
    *   - ends in terminal punctuation (`.`, `!`, `?`, or a closing
    *     quote after one), AND
    *   - has at least 5 words, AND
    *   - does not mention "javascript" (the enable-JS boilerplate).
    * Document level — the page is dropped iff
    *   - it contains "lorem ipsum" (case-insensitive), OR
    *   - it contains a curly brace (code), OR
    *   - fewer than 3 sentences survive cleaning (sentence ≈ terminal
    *     punctuation mark in the kept text).
    *
    * Returns (name, column) pairs: `clean_text` (kept lines re-joined
    * with newlines), `n_lines`, `n_lines_kept`, `n_sentences`, and the
    * document verdict `keep_doc`. Deliberately built from
    * split/filter/join list primitives so a SQL oracle can mirror it
    * exactly; every column is codegen'd and shuffle-free. */
  def c4Clean(text: Column): Seq[(String, Column)] = {
    val lines = filter(transform(split(text, "\n"), l => trim(l, " \t\r")), l => length(l) > 0)
    val kept = filter(lines, l =>
      l.rlike("[.!?][\"']?$") &&
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= 5 &&
        !lower(l).contains("javascript"))
    val cleanText = array_join(kept, "\n")
    val nSentences = size(regexp_extract_all(cleanText, lit("[.!?]"), lit(0)))
    val keepDoc = !lower(text).contains("lorem ipsum") &&
      !text.contains("{") && nSentences >= 3
    Seq(
      "clean_text" -> cleanText,
      "n_lines" -> size(lines),
      "n_lines_kept" -> size(kept),
      "n_sentences" -> nSentences,
      "keep_doc" -> keepDoc)
  }

  /** Okapi BM25 relevance of each document to a FIXED keyword query
    * (Robertson & Spärck Jones; the BM25 form with the Lucene-style
    * `+1` inside the idf log so scores stay positive — public):
    *
    *   score(D, Q) = Σ_t idf(t) · f(t,D)·(k1+1) /
    *                       (f(t,D) + k1·(1 − b + b·|D|/avgdl))
    *   idf(t) = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)
    *
    * Scale shape — the part worth copying: because the query term set
    * is small and fixed, term frequencies f(t,D) and document length
    * |D| are computed ROW-LOCALLY from the token array (no explode, no
    * per-term shuffle at all). The only distributed work is ONE tiny
    * corpus-stats aggregate (N, avgdl, and df per query term as |Q|
    * conditional counts in the same row), broadcast back onto the
    * scan. Two jobs total at any corpus size; the classic
    * explode→join formulation shuffles rows×terms. avgdl divides two
    * exactly-representable integers, so it is bit-identical across
    * engines and partition orders. */
  def bm25Score(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Score: empty query")
    require(queryTerms.distinct == queryTerms, "bm25Score: duplicate query terms")
    val withToks = docs.select(col(idCol), tokens(col(textCol)).as("__t"))
    val dfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("__t"), t), 1L).otherwise(0L)).as(s"__df$i")
    }
    val statCols = Seq(
      count(lit(1)).cast(DoubleType).as("__n"),
      (sum(size(col("__t"))).cast(DoubleType) / count(lit(1))).as("__avgdl")) ++ dfCols
    val stats = withToks.agg(statCols.head, statCols.tail: _*)
    val dl = size(col("__t")).cast(DoubleType)
    val perTerm = queryTerms.zipWithIndex.map { case (t, i) =>
      val f = size(filter(col("__t"), x => x === t)).cast(DoubleType)
      val idf = log((col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5) + 1.0)
      when(f > 0,
        idf * f * lit(k1 + 1.0) /
          (f + lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("__avgdl"))))
        .otherwise(0.0)
    }
    withToks
      .crossJoin(broadcast(stats))
      .select(col(idCol), perTerm.reduce(_ + _).as("bm25"))
  }

  /** Document fluency under a bigram language model with stupid
    * backoff (Brants et al. 2007, "Large Language Models in Machine
    * Translation", §4 — public): the cheap distributed-counting LM
    * score pipelines use where a trained KenLM is overkill.
    *
    * Counts are estimated on `countDocs` and scored on `scoreDocs` —
    * two DISTINCT corpora by contract (held-out counting is what gives
    * backoff meaning; scoring the counting corpus would never back
    * off, every bigram counts itself). Per adjacent token pair
    * (w₁, w₂) of a scored document:
    *
    *   S(w₂|w₁) = count(w₁w₂) / count(w₁)        if the bigram was seen
    *            = α · (count(w₂)+1) / (N+V)      otherwise
    *
    * with α = 0.4 (the paper's constant), N = total count-corpus
    * tokens, V = vocabulary size. The backoff unigram is add-one
    * smoothed so an out-of-vocabulary w₂ gets a finite floor instead
    * of ln(0) — the score must rank junk, not crash on it. Stupid
    * backoff is a SCORE, not a normalized probability (the paper's
    * point) — which is exactly what a quality filter thresholds.
    * Returns (idCol, bigram_logprob = mean over pairs of ln S);
    * documents with <2 tokens score null.
    *
    * Scale shape: ONE explode+groupBy each for unigram and bigram
    * counts over the count corpus; the score side joins its pairs to
    * the bigram table WITHOUT a broadcast hint — at web scale the
    * bigram table dwarfs any driver cap (it is quadratically richer
    * than the vocabulary), so the join must be free to stay a shuffled
    * hash join; AQE still broadcasts when counts are actually small.
    * N and V are one scalar row riding a broadcast crossJoin.
    *
    * Skew contract: the (w1, w2) join key is stopword-skewed by
    * construction — "of the" alone can be percents of all scored pairs,
    * so a static hash partitioning would funnel those rows through a
    * handful of reducers. AQE's skew-join does NOT rescue this shape
    * (measured, not assumed): `OptimizeSkewedJoin` pattern-matches a
    * sort-merge join whose children are sorts DIRECTLY over shuffle
    * stages, and here every build side carries its final HashAggregate
    * between the shuffle and the join — the rule never fires, and a
    * planted 40%-hot bigram sails through as a single oversized
    * partition. Salting is also wrong here: [[Skew.saltedJoin]]
    * replicates the whole build table `salts`×, and the bigram table is
    * the one table in this operator too large to replicate.
    *
    * The remedy is a hot-key differentiated join (`hotK`, default
    * 1024): the top-`hotK` bigrams and unigrams by corpus count — which
    * by definition carry the skewed traffic — are broadcast, so every
    * stopword-pair row resolves ROW-LOCALLY against the hot slice and
    * only the de-skewed residual (hottest key = the rank-hotK+1 bigram)
    * takes the shuffled path. The bigram table is pre-joined with
    * cnt_w1 count-side (distinct-pair-sized rows, occurrence-free), so
    * seen pairs never join the unigram table score-side at all.
    * Evaluation counts (round-7): the count-side model tables are
    * eagerly checkpointed (round 6 measured the un-checkpointed shape
    * re-running the count explode per `uni` consumer, 4×), and the
    * cold chain is a single branch — resolved rows ride the final w2
    * join as salted passengers instead of forking — so the score
    * explode runs exactly twice (hot + cold), down from 3×, with NO
    * occurrence-volume materialization (A/B-measured as costing as
    * much as the compute it saves).
    * `hotK = 0` restores the plain two-join shape (the audit path);
    * both paths are oracle-gated and the planted-skew test pins that
    * hot traffic never reaches a shuffle. An unseen-but-hot score pair
    * (boilerplate absent from the count corpus) dodges the bigram hot
    * slice by construction; its backoff w2 is still caught by the hot
    * UNIGRAM slice, so the residual funnel needs a token that is
    * frequent in scored pairs yet rare in the count corpus — not a
    * natural-language shape. */
  def bigramLogProb(
      scoreDocs: DataFrame, countDocs: DataFrame,
      idCol: String, textCol: String, alpha: Double = 0.4,
      hotK: Int = 1024): DataFrame = {
    def pairs(df: DataFrame, extra: Seq[Column]): DataFrame = {
      val t = tokens(col(textCol))
      df.select(extra :+ t.as("__t"): _*)
        .where(size(col("__t")) >= 2)
        .select(extra :+ explode(transform(
          sequence(lit(1), size(col("__t")) - 1),
          i => struct(
            element_at(col("__t"), i).as("w1"),
            element_at(col("__t"), i + 1).as("w2")))).as("__pr"): _*)
        .select(extra ++ Seq(col("__pr.w1").as("w1"), col("__pr.w2").as("w2")): _*)
    }
    require(hotK >= 0, s"hotK must be non-negative, got $hotK")
    val cPairs = pairs(countDocs, Seq.empty)
    val uni = countDocs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt_u"))
    val bi = cPairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt_b"))
    val totals = uni.agg(
      sum("cnt_u").cast(DoubleType).as("__n"),
      count(lit(1)).cast(DoubleType).as("__v"))
    val sPairs = pairs(scoreDocs, Seq(col(idCol)))
    def mlLp = log(col("cnt_b").cast(DoubleType)) - log(col("cnt_w1").cast(DoubleType))
    def backoffLp(cntW2: Column) =
      log(lit(alpha)) + log(cntW2.cast(DoubleType) + 1.0) -
        log(col("__n") + col("__v"))
    val scored =
      if (hotK == 0) {
        sPairs
          .join(bi, Seq("w1", "w2"), "left")
          .join(uni.select(col("w").as("w1"), col("cnt_u").as("cnt_w1")), Seq("w1"), "left")
          .join(uni.select(col("w").as("w2"), col("cnt_u").as("cnt_w2")), Seq("w2"), "left")
          .crossJoin(broadcast(totals))
          .select(col(idCol),
            when(col("cnt_b").isNotNull, mlLp)
              .otherwise(backoffLp(coalesce(col("cnt_w2"), lit(0L))))
              .as("lp"))
      } else {
        // Evaluation-count contract (round-7): the count-side model
        // tables are eagerly checkpointed — `uni` has four consumers
        // (biStats, the hot slice, the residual join, totals) and
        // `biStats` two, each of which would otherwise re-run the
        // count-corpus tokenize+explode (round 6 measured 4×/2×). Both
        // are distinct-key tables (vocabulary / distinct pairs), so the
        // materialization is distributed and occurrence-free.
        val uniC = uni.localCheckpoint(true)
        val totalsC = uniC.agg(
          sum("cnt_u").cast(DoubleType).as("__n"),
          count(lit(1)).cast(DoubleType).as("__v"))
        // count-side: attach cnt_w1 to every bigram row (distinct-pair
        // volume, not occurrence volume) so seen pairs are complete
        val biStats = bi.join(
          uniC.select(col("w").as("w1"), col("cnt_u").as("cnt_w1")), Seq("w1"))
          .localCheckpoint(true)
        // hot slices: the top-hotK rows by count — deterministic
        // tiebreak, driver-bounded (hotK rows), broadcast
        val hotPairs = broadcast(
          biStats.orderBy(col("cnt_b").desc, col("w1"), col("w2")).limit(hotK)
            .withColumn("__hotb", lit(true)))
        val hotW2 = broadcast(
          uniC.orderBy(col("cnt_u").desc, col("w")).limit(hotK)
            .select(col("w").as("w2"), col("cnt_u").as("__cnt_w2_hot"),
              lit(true).as("__hotu")))
        // split: hot pairs score row-locally (ML branch is complete);
        // only the cold residual flows into the shuffled joins. The
        // hot/cold fork re-evaluates the score explode once per side
        // (2× total, down from round 6's 3×) — deliberately NOT
        // materialized: the alternative stores occurrence-volume pairs
        // on executor disk, which round-7 A/B measured as costing as
        // much as the explode it saves, and at 100 TB the fork keeps
        // "hot traffic never shuffles" exact.
        val s1 = sPairs.join(hotPairs, Seq("w1", "w2"), "left")
        val hotScored = s1.where(col("__hotb").isNotNull)
          .select(col(idCol), mlLp.as("lp"))
        val cold = s1.where(col("__hotb").isNull)
          .select(col(idCol), col("w1"), col("w2"))
        // residual (w1, w2) join is de-skewed: its hottest key is the
        // rank-hotK+1 bigram
        val c1 = cold.join(biStats, Seq("w1", "w2"), "left")
        // unseen pairs with a hot backoff token resolve row-locally too
        val c2 = c1.join(hotW2, Seq("w2"), "left")
        // Single cold chain (round-7): rows already resolved (seen pair
        // or hot backoff token) ride the final w2 join as PASSENGERS on
        // a salted synthetic key instead of forking into a second
        // branch that would re-run the whole cold subtree. The salt
        // spreads them uniformly (no funnel) and cannot match a real
        // token — it embeds a space, and `tokens` splits on \s+ — so
        // passengers always miss and keep their already-computed
        // score. Unresolved rows have a cold w2 BY DEFINITION (a hot
        // w2 implies __hotu), so the join stays de-skewed.
        val isResolved = col("cnt_b").isNotNull || col("__hotu").isNotNull
        val c3 = c2.withColumn("__w2k",
            when(isResolved,
              concat(lit(" #"), hex(hash(col(idCol), col("w1"), col("w2")))))
              .otherwise(col("w2")))
          .join(uniC.select(col("w").as("__w2k"), col("cnt_u").as("cnt_w2")),
            Seq("__w2k"), "left")
          .crossJoin(broadcast(totalsC))
          .select(col(idCol),
            when(col("cnt_b").isNotNull, mlLp)
              .when(col("__hotu").isNotNull, backoffLp(col("__cnt_w2_hot")))
              .otherwise(backoffLp(coalesce(col("cnt_w2"), lit(0L))))
              .as("lp"))
        hotScored.unionByName(c3)
      }
    scoreDocs.select(col(idCol))
      .join(scored.groupBy(idCol).agg(avg("lp").as("bigram_logprob")), Seq(idCol), "left")
  }

  /** Shannon entropy (nats) of the character distribution — flags
    * low-entropy filler spam and high-entropy base64/minified blobs;
    * row-local codegen'd kernel ([[graft.functions.CharEntropy]]). */
  def charEntropy(text: Column): Column =
    graft.functions.CharEntropy.charEntropy(text)

  /** Unicode NFC normalization — run BEFORE any hash-identity operator
    * (exact/near dedup, line dedup, decontamination) so canonically
    * equal text hashes equally; ASCII rows return the input untouched
    * ([[graft.functions.NfcNormalize]]). */
  def nfcNormalize(text: Column): Column =
    graft.functions.NfcNormalize.nfc(text)

  /** Cross-document duplicated-span signal (the "duplicate n-gram
    * fraction" used by RefinedWeb / Dolma curation): for each document,
    * the fraction of its word `n`-gram OCCURRENCES whose gram also
    * appears in at least one other document — high values flag
    * boilerplate, mirrored pages, and template spam that document-level
    * near-dup (MinHash/SimHash) misses because the surrounding text
    * differs. Complements [[GramStats.dupNGramCharFrac]], which is the
    * WITHIN-document version of the same signal.
    *
    * Returns (idCol, dup_ngram_frac); a document with fewer than `n`
    * tokens has no grams and gets a null fraction (undefined, not 0).
    *
    * Scale: occurrences collapse to per-(gram, doc) counts in the first
    * aggregate (map-side partial agg eats within-doc repeats), then a
    * per-gram document-frequency count whose output the gram-keyed join
    * reuses without a new exchange. With `hashKeys` (the default) the
    * shuffle/join key is `xxhash64(gram)` — 8 bytes instead of the
    * 50-100-byte strings an n=8 word gram averages, a ~10× cut in
    * shuffle volume for the two aggregates and the join; a 64-bit
    * collision (≈ n²/2⁶⁴ over distinct grams) at worst nudges one
    * document's fraction, it cannot corrupt unrelated rows.
    * `hashKeys = false` shuffles the exact strings — oracle-transparent
    * and collision-free, the right mode for audits. Grams shared by
    * millions of docs (site chrome) are absorbed by the partial count,
    * never a single reducer's row explosion. */
  def crossDocDupNgramFraction(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8,
      hashKeys: Boolean = true): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val gram = explode(graft.functions.WordNGrams.wordNGramsAll(col(textCol), n)).as("gram")
    val key = if (hashKeys) xxhash64(col("gram")) else col("gram")
    val perDoc = df
      .select(col(idCol), gram)
      .select(col(idCol), key.as("__gk"))
      .groupBy(col("__gk"), col(idCol))
      .agg(count(lit(1)).as("__cnt"))
    val docFreq = perDoc.groupBy("__gk")
      .agg(count(lit(1)).as("__n_docs"))
    val frac = perDoc.join(docFreq, "__gk")
      .groupBy(col(idCol))
      .agg((sum(when(col("__n_docs") >= 2, col("__cnt")).otherwise(0L)).cast(DoubleType) /
        sum(col("__cnt")).cast(DoubleType)).as("dup_ngram_frac"))
    df.select(col(idCol)).join(frac, Seq(idCol), "left")
  }

  /** RefinedWeb/Dolma-style duplicated-span REMOVAL — the transform
    * companion to [[crossDocDupNgramFraction]]'s measurement: every
    * `n`-token window shared across ≥2 documents keeps only the copy
    * in its FIRST document (minimum id — the deterministic replayable
    * stand-in for a seen-before Bloom order); in every later document
    * all token positions covered by a duplicated window are cut and
    * the text is rebuilt from the surviving tokens in order.
    *
    * Tokenization is a plain single-space split with positions
    * preserved (no normalization — span removal must round-trip the
    * text it keeps byte-exactly); documents shorter than `n` tokens
    * carry no windows and pass through untouched. Output: `df`'s
    * columns with `textCol` rebuilt plus `n_tokens_kept` /
    * `n_tokens_dropped`.
    *
    * Scale shape: the window walk explodes n-grams but shuffles only
    * the slim `(xxhash64(gram), id)` pair for the winner aggregate
    * (distinct-per-doc first, so boilerplate repeated within one page
    * adds one row); only LOSING occurrences expand to covered token
    * positions (n rows per marked window, bounded by the duplicated
    * mass, not the corpus); the rebuild groupBy moves each surviving
    * token once — the volume a plain repartition would move. A 64-bit
    * gram-hash collision (≈ n²/2⁶⁴ over distinct windows) at worst
    * cuts one innocent window; it cannot corrupt unrelated rows. */
  def removeDupSpans(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val toks = df.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("__tpos", "__tok")))
    val grams = df
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      .select(col(idCol), posexplode(
        when(size(col("__w")) >= n,
          transform(sequence(lit(0), size(col("__w")) - n),
            p => xxhash64(array_join(slice(col("__w"), p + 1, lit(n)), " "))))
          .otherwise(array().cast("array<bigint>"))).as(Seq("__p", "__gk")))
    val winners = grams.select(col("__gk"), col(idCol)).distinct()
      .groupBy("__gk")
      .agg(min(col(idCol)).as("__wid"), count(lit(1)).as("__nd"))
      .where(col("__nd") >= 2)
      .select("__gk", "__wid")
    val covered = grams.join(winners, Seq("__gk"))
      .where(col(idCol) =!= col("__wid"))
      .select(col(idCol),
        explode(sequence(col("__p"), col("__p") + (n - 1))).as("__tpos"))
      .distinct()
    val kept = toks.join(covered, Seq(idCol, "__tpos"), "left_anti")
    Dedup.rebuildFromUnits(df, idCol, textCol, kept,
      posCol = "__tpos", unitCol = "__tok", sep = " ", prefix = "tokens")
  }

  // ---- sentence segmentation -------------------------------------------

  /** Abbreviations whose trailing period does not end a sentence —
    * the classic English closed list (public knowledge; keep it
    * short and deterministic, not exhaustive). */
  private val SentAbbrev = Set(
    "mr", "mrs", "ms", "dr", "prof", "st", "no", "vs", "etc", "fig",
    "eg", "ie", "al", "jr", "sr", "inc", "ltd", "co", "dept", "est", "approx")

  /** Rule-based sentence splitter with an exact, replayable spec:
    * a boundary is a run of `. ! ?` (plus closing `" ' ) ] ” ’`),
    * followed by whitespace, followed by an uppercase letter or
    * digit — EXCEPT when the terminator is a period whose preceding
    * word (letters only, lowercased) is a known abbreviation or a
    * single letter (middle initials). Sentences are trimmed;
    * empties dropped. Row-local, total. */
  def splitSentences(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var start = 0
    var i = 0
    val n = text.length
    def isTerm(c: Char) = c == '.' || c == '!' || c == '?'
    def isClose(c: Char) = c == '"' || c == '\'' || c == ')' || c == ']' ||
      c == '”' || c == '’'
    while (i < n) {
      if (isTerm(text.charAt(i))) {
        val termStart = i
        var j = i
        while (j < n && isTerm(text.charAt(j))) j += 1
        val hadPeriodOnly = text.substring(termStart, j) == "."
        while (j < n && isClose(text.charAt(j))) j += 1
        val afterMarks = j
        while (j < n && Character.isWhitespace(text.charAt(j))) j += 1
        val boundary =
          afterMarks < j && // at least one whitespace
            (j >= n || Character.isUpperCase(text.charAt(j)) ||
              Character.isDigit(text.charAt(j))) && {
            if (!hadPeriodOnly) true
            else {
              // letters-only word immediately before the period
              var w = termStart
              while (w > 0 && Character.isLetter(text.charAt(w - 1))) w -= 1
              val word = text.substring(w, termStart).toLowerCase
              word.length != 1 && !SentAbbrev.contains(word)
            }
          }
        if (boundary) {
          val s = text.substring(start, afterMarks).trim
          if (s.nonEmpty) out += s
          start = j
        }
        i = math.max(j, termStart + 1)
      } else i += 1
    }
    val last = text.substring(start).trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Top-k PMI collocations (Church & Hanks 1990): adjacent word
    * pairs ranked by pointwise mutual information
    * `ln((c_b/B) / ((c_1/N)·(c_2/N)))` — the classic phrase-mining /
    * word-association pass (what "new york"-style phrase detection
    * in word2vec pipelines thresholds on). `minCount` kills the
    * hapax-pair noise PMI is notorious for.
    *
    * Scale shape: one token explode → two grouped aggregations
    * (unigram + bigram TYPE tables, vocabulary-sized); the unigram
    * attach joins on single-word keys; totals are a one-row
    * broadcast; PMI is rounded to 6dp BEFORE the rank (id tiebreak),
    * so the top-k replays across engines; `TakeOrderedAndProject`
    * keeps the final k driver-bounded, never a global sort. */
  def pmiCollocations(docs: DataFrame, textCol: String, k: Int,
      minCount: Long = 2L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val t = tokens(col(textCol))
    val pairs = docs.select(t.as("__t"))
      .where(size(col("__t")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    val uni = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt_u"))
      .localCheckpoint(true) // three consumers: totals + two attaches
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
    // B is the TOTAL adjacent-pair count (Church–Hanks denominator),
    // computed from the UNFILTERED corpus — summing only pairs that
    // survive minCount would inflate every P(w1,w2). Row-local:
    // sum of (len-1) per doc, no second explode needed.
    val bTot = docs.select(greatest(size(t) - 1, lit(0)).as("__np"))
      .agg(sum("__np").cast(DoubleType).as("__b"))
    val totals = uni.agg(sum("cnt_u").cast(DoubleType).as("__n"))
      .crossJoin(bTot)
    val pmi = log(
      (col("n_pair").cast(DoubleType) / col("__b")) /
        ((col("cnt_1").cast(DoubleType) / col("__n")) *
          (col("cnt_2").cast(DoubleType) / col("__n"))))
    bi.join(uni.select(col("w").as("w1"), col("cnt_u").as("cnt_1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cnt_u").as("cnt_2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("n_pair"),
        round(pmi, 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Sparse hashed-TF-IDF document vectors — the embedding-free
    * semantic representation (the "hashing vectorizer", public
    * scikit-learn/Vowpal-Wabbit technique): FNV-hash each token into
    * `dim` buckets ([[graft.functions.DsirFeatures.dsirBuckets]], a
    * codegen expression), per-doc term counts, and the smoothed
    * `idf = ln((N+1)/(df+1)) + 1`. Returns the SPARSE frame
    * `(idCol, bucket, w)` — the input to [[tfidfNearestNeighbor]],
    * or densify for k-means/SemDeDup when no model embeddings exist.
    *
    * Scale shape: hashing is row-local; the (id, bucket) term count
    * collapses fully in the map-side partial aggregate (each doc's
    * tokens are on one input row), so the shuffle carries the final
    * sparse rows once; the df census and idf table are `dim`-bounded
    * and broadcast back. N is one count action (documented: idf uses
    * TOTAL docs, including empty ones). */
  def hashedTfidf(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 256, seed: Long = 13L): DataFrame = {
    require(dim > 0 && (dim & (dim - 1)) == 0,
      s"dim must be a positive power of two, got $dim")
    val n = docs.count()
    val tf = docs.select(col(idCol),
        explode(graft.functions.DsirFeatures.dsirBuckets(
          col(textCol), Seq(1), dim, seed)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy("bucket").agg(count(lit(1)).as("df"))
    val idf = dfTab.select(col("bucket"),
      (log((lit(n.toDouble) + lit(1.0)) /
        (col("df").cast(DoubleType) + lit(1.0))) + lit(1.0)).as("idf"))
    tf.join(broadcast(idf), Seq("bucket"))
      .select(col(idCol), col("bucket"),
        (col("tf").cast(DoubleType) * col("idf")).as("w"))
  }

  /** Exact-cosine nearest neighbor over sparse TF-IDF vectors via the
    * inverted-index join, with stop-bucket pruning: buckets whose
    * document frequency exceeds `maxDf` are excluded from BOTH sides
    * (the standard inverted-index mitigation — a stop-word bucket
    * would otherwise fan the join out toward all-pairs). Returns one
    * row per probe doc: `(idCol, nn_id, cos)` with `cos` rounded to 6
    * decimals BEFORE the argmax (ties break on the smaller candidate
    * id), so the ranking is reproducible across engines.
    *
    * Scale shape: the join cost is Σ_bucket df_probe·df_corpus, capped
    * per bucket by `maxDf`; norms are per-doc aggregations over the
    * pruned space (cosine is exact over that space, documented); the
    * ranking is a per-probe window. This is the exact refinement for
    * PROBE BATCHES — for whole-corpus semantic dedup use the LSH /
    * SemDeDup paths, which bucket instead of expanding pairs.
    *
    * SIZE `dim` WITH THE VOCABULARY (measured — SCALING.md analytics
    * tier): at fixed `dim`, a growing vocabulary densifies every
    * bucket (per-bucket df grows ~linearly with the corpus) and the
    * inverted-index join fans out super-linearly; growing `dim`
    * proportionally keeps per-bucket df ~constant and the join
    * ~linear — the standard hashing-vectorizer guidance. */
  def tfidfNearestNeighbor(sparseProbe: DataFrame, sparseCorpus: DataFrame,
      idCol: String, maxDf: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxDf >= 1L, s"maxDf must be >= 1, got $maxDf")
    val keep = sparseCorpus.groupBy("bucket")
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf).select("bucket")
    val c = sparseCorpus.join(broadcast(keep), Seq("bucket"))
      .select(col(idCol).as("__b"), col("bucket"), col("w").as("__wb"))
      .localCheckpoint(true) // feeds the dot join AND the corpus norms
    val p = sparseProbe.join(broadcast(keep), Seq("bucket"))
      .select(col(idCol).as("__a"), col("bucket"), col("w").as("__wa"))
      .localCheckpoint(true)
    val normP = p.groupBy("__a").agg(sqrt(sum(col("__wa") * col("__wa"))).as("__na"))
    val normC = c.groupBy("__b").agg(sqrt(sum(col("__wb") * col("__wb"))).as("__nb"))
    val dots = p.join(c, Seq("bucket"))
      .where(col("__a") =!= col("__b"))
      .groupBy("__a", "__b").agg(sum(col("__wa") * col("__wb")).as("__dot"))
    val cos = dots.join(normP, Seq("__a")).join(normC, Seq("__b"))
      .select(col("__a"), col("__b"),
        round(col("__dot") / (col("__na") * col("__nb")), 6).as("cos"))
    val w = Window.partitionBy("__a").orderBy(col("cos").desc, col("__b").asc)
    cos.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("__a").as(idCol), col("__b").as("nn_id"), col("cos"))
  }
}
