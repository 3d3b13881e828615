package graft.functions


import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: similarity + the candidate's id. */
final case class Scored(sim: Double, id: Long)

/** Bounded top-k aggregate (highest `sim` first, id as tiebreak).
  *
  * The point is the SHUFFLE SHAPE: as a Spark `Aggregator` this runs as
  * partial aggregation — each map task reduces its partition to at most
  * k candidates per group BEFORE the exchange, so a brute-force
  * similarity scan shuffles k rows per (query, partition) instead of
  * every scored pair. A window `row_number() <= k` must shuffle all
  * |Q|·|C| scored rows first; at 100 TB that exchange IS the job. The
  * per-row O(k) insert is irrelevant next to that (k is 10-100).
  *
  * The buffer is a descending-sorted Array capped at k, mutated IN
  * PLACE at steady state: Spark keeps the buffer object live between
  * `reduce` calls within a partition (serialization happens only at the
  * exchange), so once the buffer is full the common reject is one
  * comparison against the current k-th element, and an accepted
  * candidate is a binary search + `System.arraycopy` shift with ZERO
  * allocation — where the previous immutable-Vector splice allocated
  * ~k nodes per accepted candidate. Growth allocations happen at most
  * k times per buffer lifetime (while filling).
  */
final class TopKAgg(k: Int) extends Aggregator[Scored, Array[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Scored] = Array.empty

  // java.lang.Double.compare, not `>`: NaN must rank ABOVE every real
  // sim (Spark's descending sort order treats NaN as largest), so this
  // aggregate and the window/row_number formulation agree on inputs
  // with NaN similarities (e.g. zero vectors).
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.sim, b.sim)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def reduce(buf: Array[Scored], a: Scored): Array[Scored] = {
    val n = buf.length
    if (n >= k && !better(a, buf(n - 1))) return buf
    // binary search for the insert slot in the descending-sorted buffer
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(a, buf(mid))) hi = mid else lo = mid + 1
    }
    if (n < k) {
      val grown = new Array[Scored](n + 1)
      System.arraycopy(buf, 0, grown, 0, lo)
      grown(lo) = a
      System.arraycopy(buf, lo, grown, lo + 1, n - lo)
      grown
    } else {
      // full: shift [lo, k-1) right by one (dropping the last), in place
      System.arraycopy(buf, lo, buf, lo + 1, k - lo - 1)
      buf(lo) = a
      buf
    }
  }

  override def merge(x: Array[Scored], y: Array[Scored]): Array[Scored] =
    y.foldLeft(x)(reduce)

  override def finish(r: Array[Scored]): Seq[Scored] = r.toSeq

  override def bufferEncoder: Encoder[Array[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopKAgg {
  /** The aggregate as an untyped SQL function over (sim, id) columns. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k), Encoders.product[Scored])
}
