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

  /** (bandIdx, bandHash) table for LSH banding: the signature is split
    * into `bands` bands of `sig.length / bands` rows each; each band is
    * hashed. Docs sharing ANY (bandIdx, bandHash) are candidates. */
  private def bandTable(
      df: DataFrame, idCol: String, sigCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    df.select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            j => xxhash64(slice(col(sigCol), j * rowsPerBand + 1, lit(rowsPerBand)), j)))
          .as(Seq("band_idx", "band_hash")))

  /** Candidate near-duplicate id pairs via banded MinHash-LSH.
    * `threshold`-tuned banding is the caller's job (b·r = numHashes;
    * the s-curve midpoint is (1/b)^(1/r)). One shuffle on
    * (band_idx, band_hash); never all-pairs. */
  def lshCandidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleN: Int = 3,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    val r = numHashes / bands
    val sigs = docs
      .select(col(idCol), minhash(shingles(col(textCol), shingleN), numHashes, seed).as("sig"))
      .where(col("sig").isNotNull)
    val bt = bandTable(sigs, idCol, "sig", bands, r)
    val left = bt.select(col(idCol).as("id_a"), col("band_idx"), col("band_hash"))
    val right = bt.select(col(idCol).as("id_b"), col("band_idx"), col("band_hash"))
    left.join(right, Seq("band_idx", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
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
      seed: Long = 42L): DataFrame = {
    val cands = lshCandidatePairs(docs, idCol, textCol, numHashes, bands, shingleN, seed)
    val sh = docs.select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
    cands
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
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

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming` (< 16).
    * Banding by the four 16-bit chunks (pigeonhole: hamming ≤ 3 means at
    * least one chunk matches exactly), then exact `bit_count(xor)`
    * verify. One shuffle on (chunk_idx, chunk_value). */
  def simHashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      seed: Long = 42L): DataFrame = {
    val hashed = docs.select(
      col(idCol),
      simhash(split(lower(trim(col(textCol))), "\\s+"), seed).as("sh"))
      .where(col("sh").isNotNull)
    val chunks = hashed.select(
      col(idCol), col("sh"),
      posexplode(
        array((0 until 4).map(j =>
          shiftrightunsigned(col("sh"), j * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    val left = chunks.select(col(idCol).as("id_a"), col("sh").as("sh_a"),
      col("chunk_idx"), col("chunk_val"))
    val right = chunks.select(col(idCol).as("id_b"), col("sh").as("sh_b"),
      col("chunk_idx"), col("chunk_val"))
    left.join(right, Seq("chunk_idx", "chunk_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
