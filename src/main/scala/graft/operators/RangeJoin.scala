package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (point-in-interval) join — the equi-join formulation
  * of `p BETWEEN lo AND hi`.
  *
  * Why: Spark compiles a bare range predicate to
  * `BroadcastNestedLoopJoin` (or a cartesian product when neither side
  * fits a broadcast) — O(|P|·|I|) comparisons, the canonical 100 TB
  * cliff for event-in-window joins. Chunking the value domain into
  * fixed-width buckets turns it into a plain hash equi-join: each
  * point hashes to ONE bucket, each interval replicates to the
  * ⌈len/width⌉+1 buckets it overlaps, and the exact predicate is
  * re-checked inside the matched bucket. Every qualifying pair meets in
  * exactly one bucket (the point's), so no distinct pass is needed.
  *
  * `bucketWidth` trades interval replication (≈ mean_len/width + 1
  * copies per interval) against bucket selectivity (width ≫ spans puts
  * unrelated rows in one bucket). A width near the typical interval
  * length keeps replication ~2× and selectivity tight.
  */
object RangeJoin {

  /** Inner-join `points` to every interval of `intervals` whose
    * `[loCol, hiCol]` (inclusive) contains `pointCol`. All three
    * columns must be numeric (cast dates to day numbers first).
    * Output: point columns + interval columns. */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals share columns ${overlap.mkString(", ")} — rename before joining")
    OpUtil.requireNoColumns(points, Set("__b", "__bs"), "pointInInterval")
    OpUtil.requireNoColumns(intervals, Set("__b", "__bs"), "pointInInterval")
    def bucketOf(c: Column): Column = floor(c / bucketWidth)
    val p = points.withColumn("__b", bucketOf(col(pointCol)))
    // sequence() materializes the bucket ids an interval spans — one
    // array alloc per interval row, then a row-local explode; the
    // replicated rows carry only the interval's columns.
    // empty intervals (lo > hi) match nothing, and sequence() would
    // count DOWN through them — drop them before replication
    val i = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__bs", sequence(bucketOf(col(loCol)), bucketOf(col(hiCol))))
      .withColumn("__b", explode(col("__bs")))
      .drop("__bs")
    p.join(i, Seq("__b"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }
}
