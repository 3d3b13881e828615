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
    * SQL; a production pipeline would swap in a trained n-gram model
    * behind the same column contract. */
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
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)
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
    * term document-frequencies (tiny — vocabulary-sized, broadcast back
    * onto the tf table), and the per-doc window partitions by doc id —
    * millions of small partitions, no global sort. The corpus size N is
    * a driver-side scalar (one count job), like any fitted-statistic
    * parameter. */
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
    val scored = tf.join(broadcast(dfreq), "term")
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
}
