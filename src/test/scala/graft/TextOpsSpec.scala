package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("t")

  test("language ID picks the language whose stopwords dominate") {
    val cases = Seq(
      "The cat and the dog is on a mat of straw" -> "en",
      "Der Hund und die Katze ist da und der Vogel" -> "de",
      "el perro y los gatos es que corren y saltan" -> "es",
      "le chien et les chats est une famille et le chat" -> "fr",
      "xyzzy plugh quux" -> "unknown")
    for ((text, want) <- cases) {
      val got = one(text).select(TextOps.langId(col("t"))).collect()(0).getString(0)
      assert(got == want, s"text='$text' got=$got want=$want")
    }
  }

  test("token counting: whitespace and BPE-ish regex") {
    val t = "Hello, world! x2 = 40 items"
    assert(one(t).select(TextOps.tokenCount(col("t"))).collect()(0).getInt(0) == 6)
    // Hello , world ! x 2 = 40 items  → 9 BPE-ish pieces
    assert(one(t).select(TextOps.bpeishTokenCount(col("t"))).collect()(0).getInt(0) == 9)
  }

  test("quality metrics on a known string") {
    val metrics = TextOps.qualityMetrics(col("t")).map { case (n, c) => c.as(n) }
    val r = one("the cat the cat").select(metrics: _*).collect()(0)
    assert(r.getAs[Int]("n_chars") == 15)
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Double]("avg_token_chars") == 3.0)
    assert(r.getAs[Double]("stopword_ratio") == 0.5)
    assert(r.getAs[Double]("distinct_ratio") == 0.5)
  }

  test("fingerprint: normalization-invariant equality, content sensitivity") {
    val df = Seq(("  The Quick FOX  ", 1), ("the quick fox", 2), ("other", 3))
      .toDF("t", "i")
    val fps = df.select(TextOps.fingerprint(col("t"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("tfIdfTopTerms ranks rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common rare1"),
      (2L, "common rare2 rare2"),
      (3L, "common other")).toDF("id", "t")
    val top = TextOps.tfIdfTopTerms(docs, "id", "t", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'common' is in every doc (df=3, idf term lowest); the rare term wins
    assert(top(1L) == "rare1")
    assert(top(2L) == "rare2")
    assert(top(3L) == "other")
  }

  test("scrubPii masks emails, urls, and number runs; leaves prose alone") {
    val got = one("mail a.b+c@ex-site.org or https://ex.org/x?y=1 call 0123 456 7890 year 2024 ok")
      .select(TextOps.scrubPii(col("t"))).collect()(0).getString(0)
    assert(got == "mail <EMAIL> or <URL> call <NUMBER> year 2024 ok", got)
  }

  test("repetition metrics: doubled doc scores 0.5 on line and high on n-gram dup") {
    val body = "alpha beta gamma\ndelta epsilon zeta\neta theta iota"
    val doubled = body + "\n" + body
    val m = TextOps.repetitionMetrics(col("t")).map { case (n, c) => c.as(n) }
    val got = Seq(Tuple1(doubled)).toDF("t").select(m: _*).collect()(0)
    // 6 lines, 3 distinct → half are excess occurrences (chars likewise)
    assert(got.getAs[Double]("dup_line_frac") == 0.5)
    assert(got.getAs[Double]("dup_line_char_frac") == 0.5)
    // 17 bigrams, 9 distinct ("gamma delta" repeats via the seam too)
    assert(got.getAs[Double]("dup_2gram_frac") > 0.4)
    val clean = Seq(Tuple1(body)).toDF("t").select(m: _*).collect()(0)
    assert(clean.getAs[Double]("dup_line_frac") == 0.0)
    assert(clean.getAs[Double]("dup_3gram_frac") == 0.0)
  }

  test("repetition metrics: null fractions for empty / sub-n-gram docs") {
    val m = TextOps.repetitionMetrics(col("t")).map { case (n, c) => c.as(n) }
    val empty = one("   \n  ").select(m: _*).collect()(0)
    assert((0 until 4).forall(empty.isNullAt))
    val short = one("word").select(m: _*).collect()(0)
    assert(!short.isNullAt(0) && short.isNullAt(2) && short.isNullAt(3))
  }

  test("unigram log-prob: hand-computed corpus frequencies; null for empty docs") {
    val docs = Seq((1L, "a a b"), (2L, "b"), (3L, "  ")).toDF("id", "t")
    val got = TextOps.unigramLogProb(docs, "id", "t")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // freq: a=2, b=2, total=4 → every token lp = ln(1/2)
    val half = math.log(0.5)
    assert(math.abs(got(1L).get - half) < 1e-12)
    assert(math.abs(got(2L).get - half) < 1e-12)
    assert(got(3L).isEmpty) // token-free doc → null, not 0
  }

  test("min-k fingerprint: near-dup docs share most sketch elements") {
    val a = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
    val b = a.replace("today", "tonight")
    val c = "unrelated text about completely different things happening somewhere else entirely now"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "t")
    val sk = df.select(col("id"), TextOps.minKFingerprint(col("t")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((sk(1L) & sk(2L)).size >= 6) // k=8, one changed word
    assert((sk(1L) & sk(3L)).isEmpty)
  }
}
