package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination guard — the n-gram-collision decontamination
  * step every LLM training pipeline runs before a data release: a
  * training document is CONTAMINATED if it shares at least one word
  * n-gram with any document of the held-out eval corpus (the GPT-3 /
  * PaLM style 8-to-13-gram overlap rule; published in the GPT-3
  * appendix and the Dolma/RedPajama pipeline docs).
  *
  * Scale shape (the asymmetry is the whole design): eval corpora are
  * tiny (benchmark suites — thousands of docs) while the train side is
  * the 100 TB corpus. So the eval n-gram set is DISTINCT-ed and
  * broadcast; the train side streams through a map-side explode →
  * broadcast-hash semi-probe, and only the HITS (a sliver) reach the
  * one grouped shuffle that counts shared n-grams per doc. The train
  * corpus itself is never shuffled; the decontaminate step is a
  * broadcast anti-join of the (tiny) contaminated-id set.
  *
  * Tokenization matches [[Dedup.shingles]] (lowercase, whitespace
  * split, distinct n-grams per doc) so contamination and near-dedup
  * agree on what a "shared shingle" means.
  */
object Contamination {

  /** (idCol, n_shared) for every training doc sharing ≥ 1 word n-gram
    * with the eval corpus; `n_shared` = count of DISTINCT shared
    * n-grams (both sides dedupe per doc, so the join emits each shared
    * shingle once per train doc). */
  def contaminatedIds(
      train: DataFrame, idCol: String, textCol: String,
      eval: DataFrame, evalTextCol: String,
      n: Int = 8): DataFrame = {
    val evalNg = eval
      .select(explode(Dedup.shingles(col(evalTextCol), n)).as("__ng"))
      .distinct()
    train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("__ng"))
      .join(broadcast(evalNg), Seq("__ng"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The training corpus minus contaminated docs — same schema as
    * `train`. The contaminated-id set is USUALLY tiny, so the anti-join
    * broadcasts it and train rows never shuffle — but "usually" is not
    * a contract: a boilerplate-heavy or adversarial corpus can turn a
    * large fraction of train ids into hits and blow the broadcast. The
    * id set is therefore materialized once (localCheckpoint — slim
    * either way), counted against `maxBroadcastIds` (a scan of the
    * already-materialized blocks, not a recompute), and only
    * hint-broadcast under the threshold; above it the anti-join is left
    * to the planner (AQE still broadcasts at runtime if it happens to
    * fit — the knob removes the unconditional FORCE, not the
    * optimization). Same results either side of the threshold. */
  def decontaminate(
      train: DataFrame, idCol: String, textCol: String,
      eval: DataFrame, evalTextCol: String,
      n: Int = 8, maxBroadcastIds: Long = 10000000L): DataFrame = {
    val ids = contaminatedIds(train, idCol, textCol, eval, evalTextCol, n)
      .select(col(idCol))
      .localCheckpoint(true)
    val right = if (ids.count() <= maxBroadcastIds) broadcast(ids) else ids
    train.join(right, Seq(idCol), "left_anti")
  }

  /** Decontamination for an eval corpus too big to broadcast exactly:
    * bloom-filter the train side's exploded n-grams first
    * ([[BloomJoin.bloomSemiJoin]] on the shingle string), so the
    * shuffle of the exact semi-join sees only probable hits. Results
    * are EXACTLY [[decontaminate]]'s — the bloom stage only prunes
    * (false positives are removed by the exact join that follows). */
  def decontaminateBloom(
      train: DataFrame, idCol: String, textCol: String,
      eval: DataFrame, evalTextCol: String,
      n: Int = 8, expectedEvalNgrams: Long = -1L,
      maxBroadcastIds: Long = 10000000L): DataFrame = {
    // Materialized ONCE: the auto-size count, the bloom build, and the
    // exact semi-join inside bloomSemiJoin all read this set —
    // unmaterialized, each would re-run the eval explode+distinct.
    val evalNg = eval
      .select(explode(Dedup.shingles(col(evalTextCol), n)).as("__ng"))
      .distinct()
      .localCheckpoint(true)
    // Auto-size the filter with one pre-count of the SMALL side (cheap
    // by contract). An oversized guess is not free: the blob scales
    // with expectedItems and ships to every task as a literal — a 10M
    // default would embed ~12 MB of filter for a 200k-ngram eval set.
    val expected =
      if (expectedEvalNgrams > 0) expectedEvalNgrams
      else math.max(evalNg.count(), 1024L)
    // Same broadcast size-gate as [[decontaminate]]: the hit set is
    // usually a sliver but not by contract, so materialize it once and
    // only FORCE the broadcast under the threshold.
    val hits = BloomJoin.bloomSemiJoin(
      train.select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("__ng")),
      "__ng", evalNg, "__ng", expected)
      .select(col(idCol)).distinct()
      .localCheckpoint(true)
    val right = if (hits.count() <= maxBroadcastIds) broadcast(hits) else hits
    train.join(right, Seq(idCol), "left_anti")
  }
}
