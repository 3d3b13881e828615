package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation: two-stage salted groupBy.
  *
  * A hot grouping key funnels its entire data volume through one
  * reducer; at 100 TB that single task is the job's wall clock. Salting
  * splits each key into `salts` sub-keys for a first partial aggregation
  * (spreading the hot key over `salts` reducers), then merges the
  * partials in a second, tiny aggregation.
  *
  * Note Spark's map-side partial aggregation already handles MOST skew
  * for algebraic aggregates — salting matters when the partial-agg hash
  * table overflows (huge per-key cardinality) or for exchange-bound
  * plans; AQE's skew-join handles the join-side equivalent. This
  * operator exists for the explicit-control path.
  *
  * The salt is a content hash of the row ([[OpUtil.contentSalt]]) — a
  * retry-stable assignment (see that scaladoc for why an
  * execution-order id would corrupt results under task retry), and the
  * final merge makes the result independent of the assignment entirely.
  */
object Skew {

  /** Salted count+sum per key: semantically identical to
    * `df.groupBy(key).agg(count(1), sum(valueCol))`, executed as
    * partial-on-(key,salt) → merge-on-key. */
  def saltedCountSum(
      df: DataFrame, key: String, valueCol: String, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    OpUtil.requireNoColumns(df, Set("__salt"), "saltedCountSum")
    val salted = df.withColumn("__salt", OpUtil.contentSalt(df, salts))
    val partial = salted
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("sum"))
  }

  /** General salted aggregation: caller supplies the partial aggregates
    * and the merge aggregates (named consistently). */
  def salted(
      df: DataFrame, key: String, salts: Int,
      partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    require(salts > 0, "salts must be positive")
    OpUtil.requireNoColumns(df, Set("__salt"), "salted")
    val saltedDf = df.withColumn("__salt", OpUtil.contentSalt(df, salts))
    val partial = saltedDf
      .groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(col(key)).agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted shuffle JOIN — the explicit-control form of what AQE's
    * skew-join does adaptively: a hot join key would funnel every
    * matching row of BOTH sides through one reducer; salting splits the
    * skewed (fact) side into `salts` random sub-keys and REPLICATES
    * every build (dim) row into all `salts` sub-keys, so the hot key's
    * volume spreads over `salts` reducers. Output equals
    * `skewed.join(build, keys, joinType)` exactly; cost is `salts`× the
    * build side's shuffle volume — use when the build side is too big to
    * broadcast but far smaller than the fact side (else broadcast and
    * no salt is needed at all).
    *
    * Inner and left_outer only: right/full outer would need unmatched
    * BUILD rows deduped across their `salts` replicas — a wrong-result
    * trap, rejected loudly. */
  def saltedJoin(
      skewed: DataFrame, build: DataFrame, keys: Seq[String],
      joinType: String = "inner", salts: Int = 16,
      saltCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "leftouter" || jt == "left",
      s"saltedJoin supports inner/left_outer, got '$joinType' — an outer build " +
        "side would duplicate unmatched rows across salt replicas")
    OpUtil.requireNoColumns(skewed, Set("__salt"), "saltedJoin")
    OpUtil.requireNoColumns(build, Set("__salt"), "saltedJoin")
    // saltCols: a small row-distinguishing subset (e.g. the line-item
    // composite key) recovers the hash cost of salting a wide fact row;
    // default = every hashable column. Hashing the JOIN keys alone
    // would be useless — constant within the hot key. Same trap with
    // exact-duplicate rows under the default: identical rows share a
    // salt and a duplicate-heavy hot key re-collapses into one reducer
    // (see [[OpUtil.contentSalt]] — pass a unique-id saltCol).
    val saltedFact = skewed.withColumn("__salt",
      OpUtil.contentSalt(skewed, salts, saltCols))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    saltedFact.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
