package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DsirFeatures

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023, arXiv:2302.03169): select raw-corpus documents that
  * look like a small high-quality target corpus, by importance weights
  * computed on hashed word-n-gram bucket counts.
  *
  *   1. FIT: histogram the target and raw corpora over `numBuckets`
  *      hash buckets of their word n-grams (unigrams + bigrams by
  *      default, as in the paper); the model is the per-bucket
  *      smoothed log-likelihood ratio λ[b] = log p_target(b) − log
  *      p_raw(b).
  *   2. SCORE: a document's log importance weight is Σ_g λ[bucket(g)]
  *      over its n-gram occurrences — a single row-local codegen'd
  *      expression carrying the model as one reference object.
  *   3. RESAMPLE: keep the top-n by weight ([[resampleTopN]], the
  *      deterministic variant) or by weight + seeded Gumbel noise
  *      ([[resampleGumbel]], the paper's stochastic Gumbel-top-k,
  *      driven by [[Pipeline.hashBucket]] so it is deterministic given
  *      the seed and replayable by an external engine).
  *
  * Determinism/oracle contract: λ is stored nano-scaled as LONG
  * (`round(λ·1e9)`), and a document's weight is the exact integer sum
  * of its bucket nanos — no floating-point accumulation anywhere after
  * the fit, so scores are bit-reproducible across engines, partition
  * layouts, and gram orders. The only fp in the pipeline is the 2·B
  * `ln` calls at fit time (replayable: counts are exact integers) and
  * the final display division by 1e9.
  *
  * Scale: each corpus histogram is one scan + ONE grouped count whose
  * shuffle carries at most `numBuckets` rows per map partition (the
  * partial agg saturates); the model is 8·numBuckets bytes on the
  * driver — like any fitted model — and ships to executors inside the
  * scoring expression. Scoring and top-n are a scan plus
  * TakeOrderedAndProject heaps; nothing else shuffles. The paper's
  * hashing trick is exactly what makes the 100 TB fit feasible: the
  * histogram never depends on vocabulary size. For a huge raw corpus
  * the raw histogram may be fit on a uniform SAMPLE (rates are ratios;
  * subsampling the denominator corpus only adds variance, not bias) —
  * callers pass the sample as `raw`.
  *
  * The same machinery doubles as the classic "quality classifier"
  * filter (the GPT-3/LLaMA wiki-and-books-vs-crawl style): λ IS the
  * Naive-Bayes log-odds of the target class under the hashed-n-gram
  * bag model, so `fit(positive, negative)` + a threshold on
  * [[score]] is that classifier with no extra code.
  */
object Dsir {

  /** Fitted model: per-bucket nano-scaled log-likelihood ratios plus
    * the fit configuration the scorer must reuse verbatim. */
  case class DsirModel(
      nanoRatios: Array[Long], ns: Seq[Int], numBuckets: Int,
      seed: Long, alpha: Double) {
    require(nanoRatios.length == numBuckets,
      s"model has ${nanoRatios.length} buckets, expected $numBuckets")
  }

  /** Per-corpus bucket histogram: (bucket, cnt) with every gram
    * occurrence counted once. Buckets with zero occurrences are absent
    * (the fit re-densifies). */
  def bucketCounts(df: DataFrame, textCol: String,
      ns: Seq[Int] = Seq(1, 2), numBuckets: Int = 2048,
      seed: Long = 7L): DataFrame =
    df.select(explode(
        DsirFeatures.dsirBuckets(col(textCol), ns, numBuckets, seed)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Fit λ from the two histograms. Additive (`alpha`) smoothing keeps
    * unseen buckets finite on both sides; with B buckets and totals T:
    * p(b) = (c[b] + α) / (T + αB). */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
      ns: Seq[Int] = Seq(1, 2), numBuckets: Int = 2048,
      seed: Long = 7L, alpha: Double = 1.0): DsirModel = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    def histo(df: DataFrame): Array[Long] = {
      val out = new Array[Long](numBuckets)
      bucketCounts(df, textCol, ns, numBuckets, seed).collect()
        .foreach(r => out(r.getInt(0)) = r.getLong(1))
      out
    }
    val (ct, cr) = (histo(target), histo(raw))
    val (tT, tR) = (ct.sum, cr.sum)
    val aB = alpha * numBuckets
    val nano = Array.tabulate(numBuckets) { b =>
      // fixed association (((lnCt − lnTt) − lnCr) + lnTr): an external
      // replay must evaluate the same IEEE ops in the same order
      math.round((math.log(ct(b) + alpha) - math.log(tT + aB)
        - math.log(cr(b) + alpha) + math.log(tR + aB)) * 1e9)
    }
    DsirModel(nano, ns, numBuckets, seed, alpha)
  }

  /** Exact integer log-weight (nano units) — the canonical score. */
  def scoreNano(text: Column, model: DsirModel): Column =
    DsirFeatures.dsirScore(text, model.nanoRatios, model.ns, model.numBuckets, model.seed)

  /** Human-unit log-weight: nano / 1e9 as double (one IEEE divide —
    * still engine-reproducible, unlike a fp accumulation would be). */
  def score(text: Column, model: DsirModel): Column =
    scoreNano(text, model).cast("double") / lit(1e9)

  /** Deterministic resample: the `n` highest-weight documents, id
    * tiebreak. Global top-n compiles to TakeOrderedAndProject — per-
    * partition heaps of n rows, never a full sort. */
  def resampleTopN(df: DataFrame, idCol: String, textCol: String,
      model: DsirModel, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    df.withColumn("__nano", scoreNano(col(textCol), model))
      .orderBy(col("__nano").desc, col(idCol).asc)
      .limit(n)
      .drop("__nano")
  }

  /** STOCHASTIC resample — the paper's actual Gumbel-top-k (§2:
    * sampling without replacement with probability ∝ importance
    * weight): add an independent standard-Gumbel draw to each
    * document's LOG weight and keep the top `n` keys,
    *
    *   key_i = log w_i + G_i,   G_i = −ln(−ln U_i),
    *
    * which selects exactly as weighted sampling without replacement
    * does. U_i is NOT a runtime RNG: it rides [[Pipeline.hashBucket]]
    * (the repo's seeded multiplicative hash, plain integer arithmetic
    * any engine replays) as `(bucket(id, 2³⁰, seed) + 0.5) / 2³⁰` —
    * uniform on (0,1), never 0 or 1, deterministic given (id, seed)
    * across partition layouts, retries and engines. Different seeds
    * give independent draws (the hash's XOR seed injection); n → corpus
    * size recovers everything, n = 1 repeated over seeds recovers the
    * softmax of the log weights (property-tested).
    *
    * Scale: identical shape to [[resampleTopN]] — one row-local scoring
    * scan plus TakeOrderedAndProject heaps; the Gumbel term is three
    * arithmetic ops on top of the hash. */
  def resampleGumbel(df: DataFrame, idCol: String, textCol: String,
      model: DsirModel, n: Int, seed: Long = 11L): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val buckets = 1 << 30
    val u = (Pipeline.hashBucket(col(idCol), buckets, seed)
      .cast("double") + 0.5) / buckets.toDouble
    val key = scoreNano(col(textCol), model).cast("double") / lit(1e9) +
      -log(-log(u))
    df.withColumn("__gumbel_key", key)
      .orderBy(col("__gumbel_key").desc, col(idCol).asc)
      .limit(n)
      .drop("__gumbel_key")
  }
}
