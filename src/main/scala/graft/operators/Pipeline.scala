package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: document chunking, deterministic
  * splits/sampling, global shuffle, and sequence packing.
  *
  * Scale design (the 100 TB contract): chunking, splitting and sampling
  * are pure row-local expressions (no shuffle, whole-stage codegen);
  * the global shuffle is ONE range-partitioned sort (what
  * `orderBy` compiles to); sequence packing uses a running-total window
  * — partition it by a shard column (`partitionCols`) so no single
  * ordered stream spans the corpus.
  *
  * Determinism: every operator here is a pure function of its inputs —
  * sampling and splits use multiplicative hashing on a key column, not
  * `rand()`, so results are stable across retries, partitionings, and
  * re-runs (a lineage requirement for training-data provenance).
  */
object Pipeline {

  /** Multiplicative hash modulo the Mersenne prime 2^31-1, with an XOR
    * seed injection between two multiplication rounds, over the
    * high-bits-folded id. Chosen so that
    * (a) every intermediate fits a 64-bit signed integer for ANY 64-bit
    * id — no ANSI-mode overflow (operands stay < 2^31 before each
    * multiply by K < 2^31); (b) the bucket depends on the WHOLE id: the
    * initial `xor(id, id >>> 31)` folds the high 32 bits into the low
    * word, so two ids congruent mod 2^31-1 (invisible to a bare
    * `id % M` first step) still hash independently, and a raw
    * `id*K mod m` collapsing structured ids — e.g. all multiples of
    * 1000 — into one bucket is likewise avoided; (c) seeds compose
    * NON-affinely (an additive seed only shifts the hash by a constant,
    * leaving two seeded decisions perfectly correlated — XOR between
    * rounds breaks that); (d) it stays plain arithmetic + xor that
    * external engines reproduce bit-for-bit for non-negative ids
    * (`>>> 31` ≡ integer-divide by 2^31):
    * `xor(xor(id, id // 2147483648) % 2147483647
    *      * 1103515245 % 2147483647, seed) * 1103515245 % 2147483647`. */
  private val M = 2147483647L // 2^31 - 1, prime
  private val K = 1103515245L

  /** Bucket in [0, buckets) for a numeric id column. `seed` separates
    * operators: a sample at rate r composed with a split at rate t must
    * make INDEPENDENT decisions, which sharing one unseeded hash would
    * break (every sample survivor would land in the same split). */
  def hashBucket(id: Column, buckets: Int = 1000, seed: Long = 0L): Column = {
    require(seed >= 0 && seed < M, s"seed must be in [0, $M), got $seed")
    val idl = id.cast("long")
    val folded = idl.bitwiseXOR(shiftrightunsigned(idl, 31))
    val r1 = pmod(pmod(folded, lit(M)) * K, lit(M))
    pmod(r1.bitwiseXOR(lit(seed)) * K, lit(M)) % buckets
  }

  /** Split `text` into overlapping token windows of `maxTokens` tokens
    * (stride = maxTokens - overlap). Output: one row per chunk with
    * `chunk_idx` and `chunk_text`. Row-local: tokenize, count, expand
    * with a `sequence` + `explode` — no shuffle, and the doc text is
    * never copied more than the overlap factor.
    *
    * Tokenization is a single-space split so the semantics are exactly
    * reproducible by any engine (pass pre-normalized text for real
    * corpora — see [[TextOps]]). */
  def chunkDocuments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens=$maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap=$overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // 1 chunk when n <= maxTokens, else 1 + ceil((n - maxTokens) / stride)
    val numChunks = when(n <= maxTokens, lit(1))
      .otherwise(lit(1) + ceil((n - lit(maxTokens)).cast("double") / stride).cast("int"))
    docs
      .select(col(idCol), toks.as("__toks"), numChunks.as("__nc"))
      .select(
        col(idCol),
        posexplode(transform(
          sequence(lit(0), col("__nc") - 1),
          i => array_join(slice(col("__toks"), i * stride + 1, lit(maxTokens)), " ")))
          .as(Seq("chunk_idx", "chunk_text")))
  }

  /** Deterministic train/test split: rows whose id hash-bucket falls
    * below `testPerMille` go to "test". Pure projection — no shuffle,
    * no rand(); the same row lands in the same split on every run and
    * every partitioning. */
  /** Domain-separation seeds: split and sample decisions must be
    * independent when composed (see [[hashBucket]]). */
  val SplitSeed = 101L
  val SampleSeed = 202L

  def trainTestSplit(df: DataFrame, idCol: String, testPerMille: Int): DataFrame = {
    require(testPerMille >= 0 && testPerMille <= 1000)
    df.withColumn(
      "split",
      when(hashBucket(col(idCol), 1000, SplitSeed) < testPerMille, lit("test"))
        .otherwise(lit("train")))
  }

  /** Weighted mixture sampling: keep a row with per-mille rate
    * `weights(source)` (unlisted sources use `defaultPerMille`).
    * The sampling decision is a row-local hash comparison — the
    * standard way to re-weight training-data sources (e.g. upsample
    * wiki, downsample crawl) without a shuffle or RNG state. */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: Map[String, Int],
      defaultPerMille: Int = 0): DataFrame = {
    require((defaultPerMille +: weights.values.toSeq).forall(w => w >= 0 && w <= 1000))
    val rate = weights.foldLeft(lit(defaultPerMille): Column) {
      case (acc, (src, w)) => when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), 1000, SampleSeed) < rate)
  }

  /** Temperature-weighted mixture: per-source keep-rates computed FROM
    * the data so post-sampling proportions track `n_s^alpha`
    * (alpha = 1/T < 1 flattens the source distribution — the standard
    * multilingual/multi-source rebalancing, e.g. mBERT/XLM exponent
    * 0.7 or T=2 → alpha 0.5). The smallest source is kept whole; source
    * s keeps `max(1, floor(1000·(n_min/n_s)^(1-alpha)))` per-mille via
    * the row-local hash filter of [[mixtureSample]] — clamped so an
    * extreme size ratio can only downsample a source to 1‰, never
    * silently drop it.
    *
    * One tiny grouped count reaches the driver (source-cardinality
    * rows — fitted sampler weights, like any model parameter); nothing
    * else leaves the executors. Determinism note: `Math.pow` is
    * within 1 ulp (IEEE `sqrt` exact at alpha=0.5), so rates replay
    * bit-for-bit in any engine except when `1000·pow(...)` lands within
    * an ulp of an integer — use simple alphas for cross-engine gates. */
  def temperatureMixture(
      df: DataFrame, idCol: String, sourceCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    OpUtil.requireNoColumns(df, Set("__src"), "temperatureMixture")
    // Normalize the group key: cast to string (integer-coded sources
    // would fail the driver-side getString) and give nulls their own
    // sentinel group — otherwise null-source rows silently sample at
    // rate 0 while still deflating nMin for every real source. Rows
    // with null ids are excluded from BOTH counting and output: the
    // hash filter can never keep them, so counting them would deflate
    // every source's keep-rate (same contract as the other samplers).
    val srcKey = coalesce(col(sourceCol).cast("string"), lit("__null__"))
    val base = df.where(col(idCol).isNotNull)
    val grouped = base
      .groupBy(srcKey.as("__src"), col(sourceCol).isNull.as("__isn"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    // a REAL source valued "__null__" would silently merge with the
    // null group under the sentinel — reject the ambiguity loudly
    require(!grouped.exists { case (s, isn, _) => s == "__null__" && !isn },
      "temperatureMixture: source column contains the literal \"__null__\", " +
        "which collides with the null-group sentinel — rename that value first")
    val counts = grouped.map { case (s, _, n) => s -> n }.toMap
    require(counts.nonEmpty, "temperatureMixture: empty input")
    val nMin = counts.values.min.toDouble
    val expo = 1.0 - alpha
    // sqrt, not pow, at the alpha=0.5 default: Math.sqrt is IEEE
    // correctly rounded (pow is only 1-ulp), so SQL replays it exactly
    def p(x: Double): Double = if (expo == 0.5) math.sqrt(x) else math.pow(x, expo)
    // Clamp to ≥ 1 per-mille: temperature REBALANCING must keep every
    // source represented, but an extreme size ratio — n_s/n_min beyond
    // 1000^(1/(1-alpha)), e.g. 10⁶× at alpha 0.5 — floors to rate 0 and
    // would silently DELETE the source. The clamp is mirrored in the
    // oracle (greatest(1, floor(...))).
    val rates = counts.map { case (s, n) =>
      s -> math.max(1, math.floor(1000.0 * p(nMin / n.toDouble)).toInt)
    }
    mixtureSample(base.withColumn("__src", srcKey), idCol, "__src", rates)
      .drop("__src")
  }

  /** Deterministic global shuffle: total order by `shuffleKey(id)`,
    * ties broken by the id itself. Compiles to ONE range-partitioned
    * sort (sampled range boundaries, then sort-within-partition) — the
    * scalable way to decorrelate training examples from their source
    * order. Different `seed` → a different permutation. */
  def globalShuffle(df: DataFrame, idCol: String, seed: Long = 0L): DataFrame =
    globalShuffleBy(df, shuffleKey(col(idCol), seed), col(idCol))

  /** [[globalShuffle]] with a caller-supplied sort key (e.g. the
    * arithmetic [[hashBucket]] when an external system must reproduce
    * the exact permutation). */
  def globalShuffleBy(df: DataFrame, key: Column, tiebreak: Column): DataFrame =
    df.orderBy(key, tiebreak)

  /** Shuffle sort key: 64-bit avalanche hash of id + seed. */
  def shuffleKey(id: Column, seed: Long): Column = xxhash64(id, lit(seed))

  /** Deterministic stratified sample: the `k` rows of each group with
    * the smallest seeded [[hashBucket]] of `idCol` — a uniform
    * without-replacement per-group sample (hash order is independent of
    * storage order) that an external engine reproduces bit-for-bit
    * (order by the mirrored hash, id ascending, take k per group).
    *
    * Scale shape: selection is a k-bounded PARTIAL aggregate
    * ([[graft.functions.TopKAgg]]) — each map task reduces to ≤ k
    * candidates per group BEFORE the exchange, so the shuffle carries
    * k·partitions rows per group. The per-group-window formulation
    * (`row_number() <= k` over partitionBy(group)) would funnel every
    * row of a group through ONE partition — a skew-killer when a group
    * is a terabyte. The chosen-id table (k × groups) broadcasts back
    * for the semi-join, so the corpus itself never shuffles. */
  def stratifiedSample(
      df: DataFrame, groupCol: String, idCol: String,
      k: Int, seed: Long = 0L): DataFrame =
    // negate: TopKAgg keeps the HIGHEST ranks, we want the smallest
    // hashes; ties (equal hash) break toward the smaller id in both
    // this aggregate and the documented mirror order.
    selectTopPerGroup(df, groupCol, idCol,
      (-hashBucket(col(idCol), Int.MaxValue, seed)).cast("double"), k,
      "stratifiedSample")

  /** The curation sibling of [[stratifiedSample]]: keep the `k`
    * HIGHEST-`scoreCol` rows of each group (ties toward the smaller
    * id) — "best N documents per domain". Same k-bounded partial
    * aggregate shape, same external-mirror order
    * (score descending, id ascending, take k per group). */
  def topNPerGroup(
      df: DataFrame, groupCol: String, idCol: String, scoreCol: String,
      k: Int): DataFrame =
    selectTopPerGroup(df, groupCol, idCol, col(scoreCol).cast("double"), k,
      "topNPerGroup")

  private def selectTopPerGroup(
      df: DataFrame, groupCol: String, idCol: String, rank: Column,
      k: Int, opName: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case t => throw new IllegalArgumentException(
        s"$opName needs an integral id, got $idCol: ${t.catalogString}")
    }
    val topk = graft.functions.TopKAgg.topK(k)
    // null ids and null ranks can never be selected (the aggregate's
    // fields are non-nullable primitives, and a null rank has no
    // position in the mirror order) — exclude both from candidacy up
    // front instead of failing mid-job.
    val chosen = df
      .where(col(idCol).isNotNull && rank.isNotNull)
      .select(col(groupCol), rank.as("__rk"), col(idCol).cast("long").as("__id"))
      .groupBy(groupCol)
      .agg(topk(col("__rk"), col("__id")).as("__top"))
      .select(col(groupCol), explode(col("__top.id")).as("__sid"))
    // <=> on the group key: a null group is a real group (the window
    // mirror keeps its partition) and plain === would silently drop it
    df.join(broadcast(chosen),
      df(groupCol) <=> chosen(groupCol) &&
        df(idCol).cast("long") === chosen("__sid"),
      "left_semi")
  }

  /** Deterministic GLOBAL uniform sample of exactly `k` rows: the k
    * smallest seeded hashes corpus-wide. Compiles to
    * `TakeOrderedAndProject` — per-partition k-element heaps, k rows
    * per partition to the driver-side merge, NO global sort and no
    * full shuffle. The mirror order is the seeded hash ascending, id
    * ascending, LIMIT k. Null ids are never selected (engines disagree
    * on null sort position, so they cannot be mirrored — same contract
    * as [[stratifiedSample]]). */
  def uniformSample(
      df: DataFrame, idCol: String, k: Int, seed: Long = 0L): DataFrame =
    df.where(col(idCol).isNotNull)
      .orderBy(hashBucket(col(idCol), Int.MaxValue, seed), col(idCol)).limit(k)

  /** Pack documents into fixed token-budget bins: bin(i) =
    * floor(exclusive-running-sum(tokens) / budget) in `orderCol` order
    * within each `partitionCols` shard. One window over one shuffle;
    * sharding (e.g. by source or hash range) keeps any single ordered
    * stream from spanning the corpus. This is the streaming
    * running-total relaxation of bin packing (bins can exceed `budget`
    * by one doc's tail — exact first-fit is inherently sequential and
    * does not scale). Output: input columns + `bin`; bin ids are
    * per-shard (disambiguate with the shard columns downstream).
    *
    * `partitionCols = Nil` is REJECTED unless `singleStream = true`:
    * the unsharded window is `partitionBy(lit(1))` — the entire corpus
    * through one ordered reducer, a silent scale-killer as a default.
    * Opt in explicitly for small frames where one global stream is the
    * intended semantics. */
  def packSequences(
      df: DataFrame,
      tokenCountCol: String,
      budget: Int,
      orderCol: String,
      partitionCols: Seq[String] = Nil,
      singleStream: Boolean = false): DataFrame = {
    require(budget > 0)
    require(partitionCols.nonEmpty || singleStream,
      "packSequences without partitionCols funnels the whole corpus through ONE " +
        "ordered window partition. Pass shard columns (source, or a hash bucket " +
        "of the order key), or opt in with singleStream=true for a small frame.")
    val w0 = if (partitionCols.isEmpty) Window.partitionBy(lit(1))
             else Window.partitionBy(partitionCols.map(col): _*)
    val w = w0.orderBy(col(orderCol)).rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(
      "bin",
      floor(coalesce(sum(col(tokenCountCol)).over(w), lit(0L)) / budget))
  }

  /** Curation v3 — the MODERN four-stage pipeline composed end-to-end
    * with first-fail accounting, one decision per document:
    *
    *  1. `len`      — fewer than `minTokens` whitespace tokens;
    *  2. `flagged`  — the trained [[QualityClassifier]] model predicts
    *                  positive (the distilled heuristic flag — e.g. a
    *                  toxicity/contamination signal);
    *  3. `ppl_tail` — mean Kneser–Ney trigram log-probability below
    *                  `pplTailMax` (the CCNet tail cut; the LM trains
    *                  on `docs` itself — the self-scored corpus shape);
    *  4. `dup`      — exact-duplicate body (xxhash64 of the normalized
    *                  text) where a SURVIVING smaller id exists — dedup
    *                  runs over the pool that passed stages 1–3, the
    *                  order real pipelines use;
    *  5. `kept`     — everything else.
    *
    * Scale shape: stages 1–2 are row-local expressions in ONE scan
    * (the model rides the task closure); stage 3 is the KN scoring
    * pipeline (hot-slice de-skewed joins, see
    * [[KneserNey.trigramLogProb]]); stage 4 is one slim fingerprint
    * aggregation + one fingerprint-keyed join back — the full text
    * never shuffles. */
  def curateV3(docs: DataFrame, idCol: String, textCol: String,
      model: graft.operators.QualityClassifier.LrModel, minTokens: Int,
      pplTailMax: Double, hotK: Int = 1024): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    val scored = graft.operators.QualityClassifier.score(docs, textCol, model)
    val kn = graft.operators.KneserNey.trigramLogProb(
      docs, docs, idCol, textCol, hotK = hotK)
    val base = scored.select(col(idCol),
        TextOps.tokenCount(col(textCol)).as("__nt"),
        TextOps.fingerprint(col(textCol)).as("__fp"),
        col("pred").as("__pred"))
      .join(kn, Seq(idCol), "left")
    val staged = base.withColumn("__drop0",
      when(col("__nt") < minTokens, "len")
        .when(col("__pred") === 1, "flagged")
        .when(col("n_scored") > 0L &&
          (col("lp_sum") / col("n_scored").cast("double")) < pplTailMax,
          "ppl_tail"))
    val keepers = staged.where(col("__drop0").isNull)
      .groupBy("__fp").agg(min(col(idCol)).as("__keeper"))
    staged.join(keepers, Seq("__fp"), "left")
      .select(col(idCol),
        coalesce(col("__drop0"),
          when(col(idCol) =!= col("__keeper"), "dup").otherwise("kept"))
          .as("stage"))
  }
}
