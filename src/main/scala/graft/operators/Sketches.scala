package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KmvAgg

/** Mergeable sketch operators for corpus statistics. First resident:
  * the KMV distinct-count estimate ([[graft.functions.KmvAgg]]) —
  * exactly replayable, k-bounded partial aggregation, one ≤k-row
  * shuffle per partition regardless of corpus size. */
object Sketches {

  /** Distinct-count estimate of a caller-supplied non-negative long
    * hash column over a hash space [0, hashSpace). One output row:
    *   n_sketch   — sketch fill (min(k, true distinct count)),
    *   kth_hash   — the k-th smallest distinct hash (null if the
    *                sketch never filled: the count is then EXACT and
    *                equals n_sketch),
    *   est        — (k−1)·hashSpace/kth when full, else n_sketch.
    * The hash must be uniform on the space for the estimate to mean
    * anything; determinism (not uniformity) is what the correctness
    * gate checks. */
  def kmvDistinct(df: DataFrame, hash: Column, k: Int, hashSpace: Double): DataFrame = {
    val sk = KmvAgg.kmv(k)
    df.select(hash.cast("long").as("h"))
      .agg(sk(col("h")).as("sketch"))
      .select(
        size(col("sketch")).as("n_sketch"),
        when(size(col("sketch")) === k, element_at(col("sketch"), k))
          .as("kth_hash"),
        when(size(col("sketch")) === k,
          lit((k - 1).toDouble * hashSpace) / element_at(col("sketch"), k))
          .otherwise(size(col("sketch")).cast("double"))
          .as("est"))
  }
}
