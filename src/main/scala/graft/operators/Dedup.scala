package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.MinHashSignature.minhash
import graft.functions.SimHash64.simhash

/** Deduplication operators over document tables — exact, MinHash-LSH,
  * SimHash, and exact n-gram-Jaccard.
  *
  * Scale design (the 100 TB contract): nothing here is all-pairs. Exact
  * dedup is one hash shuffle on the key. Near-dup is
  * shingle → signature (row-local) → banded LSH (ONE shuffle on
  * (band, bandHash)) → candidate pairs (bucket-local) → exact verify
  * (join back, row-local compare). The only quadratic work is inside a
  * bucket, which banding keeps tiny; AQE skew-join handles degenerate
  * buckets (e.g. boilerplate-heavy corpora).
  */
object Dedup {

  /** Distinct word n-gram shingles of a text column, lowercased,
    * whitespace-tokenized — one-pass native expression
    * ([[graft.functions.WordNGrams]]; the equivalent
    * transform/slice/concat_ws higher-order pipeline measured 10×+
    * slower). Docs shorter than `n` tokens yield an empty array. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.WordNGrams.wordNGrams(text, n)

  /** Exact duplicate removal on a subset of columns (hash-partitioned
    * groupBy under the hood — pandas `drop_duplicates`). */
  def exact(df: DataFrame, subset: Seq[String] = Nil): DataFrame =
    if (subset.isEmpty) df.dropDuplicates() else df.dropDuplicates(subset)

  /** Exact dedup by content hash — the classic "hash-groupBy" dedup for
    * wide payloads: compares 64-bit fingerprints instead of full values
    * so the shuffle carries hashes, not documents. */
  def exactByHash(df: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(xxhash64(col(textCol))).orderBy(col(textCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** All (a, b) pairs, a < b, of the sorted `elems` array column —
    * the within-bucket pair expansion for the minhash-LSH bucket table.
    * Quadratic ONLY inside a bucket, and banding keeps minhash buckets
    * tiny (a degenerate mega-bucket means near-identical docs — run
    * exact dedup first). For band schemes with LARGE buckets (e.g.
    * 16-bit simhash chunks) a codegen'd self-join beats this HOF
    * expansion — see [[simHashPairs]]. */
  private def inBucketPairs(elems: Column)(pair: (Column, Column) => Column): Column =
    flatten(transform(elems, (x, i) =>
      transform(slice(elems, i + 2, size(elems)), y => pair(x, y))))

  /** [[inBucketPairs]] with the verify predicate pushed INSIDE the
    * expansion: candidates failing `keep` are filtered before the pair
    * struct is allocated or exploded into a row. For selective
    * verifies (simhash hamming keeps ~1% of candidates) this shrinks
    * the explode output and the downstream distinct shuffle by the
    * same ~100×. */
  private def inBucketPairsWhere(elems: Column)(keep: (Column, Column) => Column)(
      pair: (Column, Column) => Column): Column =
    flatten(transform(elems, (x, i) =>
      transform(
        filter(slice(elems, i + 2, size(elems)), y => keep(x, y)),
        y => pair(x, y))))

  /** Candidate near-duplicate id pairs via banded MinHash-LSH.
    * `threshold`-tuned banding is the caller's job (b·r = numHashes;
    * the s-curve midpoint is (1/b)^(1/r)).
    *
    * Shape: raw text → fused tokenize+shingle+minhash+band hash (ONE
    * native codegen'd pass over the bytes,
    * [[graft.functions.TextMinHashBands]] — no token array, no shingle
    * strings, no signature array; valid because minhash is
    * duplicate-insensitive) → posexplode → ONE grouped shuffle on
    * (band_idx, band_hash) → in-bucket pair expansion — never
    * all-pairs, and the signature compute runs ONCE (a bucket
    * self-join would run it per join side). `collect_list` not
    * `collect_set`: a doc contributes each band index exactly once, so
    * duplicates are impossible and set-dedup hashing is wasted work. */
  def lshCandidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleN: Int = 3,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    docs
      .select(
        col(idCol),
        posexplode(
          graft.functions.TextMinHashBands.textMinhashBands(
            col(textCol), shingleN, numHashes, bands, seed))
          .as(Seq("band_idx", "band_hash")))
      .groupBy("band_idx", "band_hash")
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(inBucketPairs(col("ids"))((a, b) =>
        struct(a.as("id_a"), b.as("id_b")))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Exact word-shingle Jaccard between two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(
        size(array_intersect(a, b)).cast(DoubleType) /
          size(array_union(a, b)).cast(DoubleType))

  /** Full MinHash-LSH near-dup pipeline: banded candidates, then exact
    * shingle-Jaccard verification ≥ `threshold`. Output:
    * (id_a, id_b, jaccard), id_a < id_b. */
  def nearDupMinHash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleN: Int = 3,
      seed: Long = 42L,
      verifyOnlyCandidates: Boolean = false): DataFrame = {
    val cands = lshCandidatePairs(docs, idCol, textCol, numHashes, bands, shingleN, seed)
    // verifyOnlyCandidates: shingle only docs that appear in a candidate
    // pair. At 100 TB candidates are a sliver of the corpus, so the
    // semi-join spares the verify scan from re-shingling everything —
    // but deriving the id set re-evaluates the candidate plan, so it
    // only pays when candidates ≪ corpus (persist/checkpoint `cands`
    // in a real deployment). Off by default: on dup-dense data the
    // one-pass plan is faster (measured 1.4× at sf0.1, where nearly
    // every doc IS a candidate).
    val base =
      if (!verifyOnlyCandidates) docs
      else docs.join(
        cands.select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct(),
        Seq(idCol), "left_semi")
    val sh = base.select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
    cands
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Connected components over near-duplicate pairs: (id, cluster)
    * where cluster = the minimum id reachable through the pair graph.
    * This is the step that turns pair OUTPUT into an actual dedup
    * decision — every document in a duplicate cluster maps to one
    * canonical representative.
    *
    * Algorithm: iterative min-label propagation — each round every
    * node takes the min of its own label and its neighbors' labels
    * (one join + one groupBy per round), until a fixpoint. Rounds
    * needed = graph diameter; near-dup clusters are shallow (most are
    * pairs/stars), so this converges in a few rounds where a recursive
    * closure would not scale. `localCheckpoint` truncates the plan
    * lineage each round — without it the iterated join plan grows
    * exponentially. */
  def duplicateClusters(
      pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a"), col("id_b"))
      .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .localCheckpoint(true)
    var labels = edges.select(col("id_a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val neighborMin = edges
        .join(labels.select(col("id").as("id_b"), col("label").as("nl")), "id_b")
        .groupBy(col("id_a").as("id"))
        .agg(min(col("nl")).as("nmin"))
      // Keep the old label alongside the new one so the convergence
      // check is a filter over this round's (checkpointed) result — one
      // join per round, not a second join against the previous labels.
      // LAZY checkpoint + a full-scan count() fuses materialization and
      // the convergence check into ONE job per round (an eager
      // checkpoint followed by isEmpty was two); count aggregates every
      // partition, so the checkpoint is fully materialized before the
      // lineage is truncated.
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(false)
      converged = stepped.where(col("label") < col("old")).count() == 0
      labels = stepped.select(col("id"), col("label"))
      iters += 1
    }
    // A component whose diameter exceeds maxIters would return SPLIT
    // clusters (several "representatives" for one duplicate group) —
    // silently wrong for the downstream drop. Fail loudly instead;
    // near-dup graphs are shallow, so hitting this means either a
    // pathological corpus or a caller who should raise maxIters.
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters did not converge in $maxIters rounds — a duplicate " +
          "component has diameter > maxIters; raise maxIters")
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Drop near-duplicates: keep every row not in any pair, plus the
    * minimum-id representative of each duplicate cluster. `pairs` is
    * the output of any of the pair generators above. */
  def dropNearDuplicates(
      docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clusters = duplicateClusters(pairs)
    val losers = clusters.where(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold — the brute-force
    * oracle path. QUADRATIC: for small frames / within-bucket verify
    * only; the scale path is [[nearDupMinHash]]. */
  def nearDupJaccardBrute(
      docs: DataFrame, idCol: String, textCol: String, threshold: Double,
      shingleN: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
    val a = sh.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`.
    * Banding by the four 16-bit chunks (pigeonhole: hamming ≤ 3
    * GUARANTEES a matching chunk; larger `maxHamming` keeps recall high
    * but not certain — bits can spread across all 4 chunks), then exact
    * `bit_count(xor)` verify.
    *
    * Shape: fused tokenize+simhash (ONE native pass over the raw bytes
    * for ASCII rows; canonical Unicode tokenization fallback otherwise
    * — see [[graft.functions.SimHash64.computeText]]) → ONE grouped shuffle
    * on (chunk_idx, chunk_val) → in-bucket pair expansion with the
    * hamming verify pushed INSIDE the expansion
    * ([[inBucketPairsWhere]]), so only surviving pairs are ever
    * allocated, exploded, or carried by the distinct shuffle. */
  def simHashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      seed: Long = 42L): DataFrame = {
    val hashed = docs.select(
      col(idCol),
      simhash(col(textCol), seed).as("sh"))
      .where(col("sh").isNotNull)
    val chunks = hashed.select(
      col(idCol), col("sh"),
      posexplode(
        array((0 until 4).map(j =>
          shiftrightunsigned(col("sh"), j * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    chunks
      .groupBy("chunk_idx", "chunk_val")
      // collect_list, not collect_set: a doc contributes each chunk_idx
      // exactly once, so duplicates are impossible and set-hashing of
      // the structs is wasted work. Sorted so pairs emit id_a < id_b.
      .agg(array_sort(
        collect_list(struct(col(idCol).as("id"), col("sh").as("sh")))).as("es"))
      .where(size(col("es")) > 1)
      .select(explode(
        inBucketPairsWhere(col("es"))((a, b) =>
          bit_count(a.getField("sh").bitwiseXOR(b.getField("sh"))) <= maxHamming)(
          (a, b) =>
            struct(
              a.getField("id").as("id_a"),
              b.getField("id").as("id_b"),
              bit_count(a.getField("sh").bitwiseXOR(b.getField("sh"))).as("hamming"))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .distinct()
  }
}
