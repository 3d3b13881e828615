package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters — frequent-item candidates without a full
  * `groupBy` over the (huge) key space: the vocabulary/domain-stats op
  * of a corpus-scale pipeline, where an exact token count would shuffle
  * one row per DISTINCT key (billions) just to read off the head.
  *
  * Shape: each partition summarizes locally with a k-counter
  * Misra–Gries sketch (plain mutable map, O(k) memory, one pass), so
  * the exchange carries ≤ k rows per partition; summing per-partition
  * estimates is the standard mergeable-summaries composition (Agarwal
  * et al., "Mergeable Summaries", PODS 2012). Candidates — not the
  * corpus — are what shuffles.
  *
  * Guarantees (n = total non-null rows, true(t) = t's true count):
  *  - est(t) ≤ true(t) (MG only undercounts);
  *  - true(t) − est(t) ≤ n/(k+1) (each partition undercounts by at most
  *    n_p/(k+1); the sums telescope);
  *  - every t with true(t) > n/(k+1) appears in the output.
  * The `text_heavyhitters` gate audits all three against exact counts.
  */
object HeavyHitters {

  /** Candidate frequent values of `colName` (cast to string) with
    * lower-bound estimates: (colName, est), ≤ k·partitions rows. Output
    * is a candidate SET with guaranteed recall of the > n/(k+1) head —
    * rank by `est` and verify with an exact count over candidates only
    * (a semi-join — cheap) when exact head counts are needed. */
  def heavyHitters(df: DataFrame, colName: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val partials = df
      .select(col(colName).cast("string"))
      .as[String](Encoders.STRING)
      .mapPartitions { it =>
        val counters = new java.util.HashMap[String, Long](k * 2)
        while (it.hasNext) {
          val t = it.next()
          if (t != null) {
            val c = counters.getOrDefault(t, 0L) // counters never hold 0
            if (c > 0L) counters.put(t, c + 1L)
            else if (counters.size < k) counters.put(t, 1L)
            else {
              // decrement-all: the classic MG step; O(k), amortized by
              // the ≥ k arrivals that filled the counters
              val iter = counters.entrySet().iterator()
              while (iter.hasNext) {
                val e = iter.next()
                if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1L)
              }
            }
          }
        }
        val out = new Array[(String, Long)](counters.size)
        var i = 0
        val iter = counters.entrySet().iterator()
        while (iter.hasNext) {
          val e = iter.next(); out(i) = (e.getKey, e.getValue); i += 1
        }
        out.iterator
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .toDF(colName, "est_part")
    partials.groupBy(colName).agg(sum("est_part").as("est"))
  }
}
