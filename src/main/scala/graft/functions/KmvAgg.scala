package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k minimum values) distinct-count sketch (Bar-Yossef et al.
  * 2002, public algorithm): keep the k smallest DISTINCT hash values
  * seen; if the sketch fills, the k-th smallest hash h₍ₖ₎ estimates
  * the distinct count as `(k−1)·H/h₍ₖ₎` for a hash space [0, H).
  *
  * Unlike HLL it is EXACTLY replayable by an external oracle — the
  * sketch content is a pure function of the data and the hash, no
  * register randomness — which is why it earns a correctness gate
  * where `approx_count_distinct` cannot.
  *
  * Shuffle shape (the reason this is an `Aggregator`, mirroring
  * [[TopKAgg]]): partial aggregation reduces every partition to ≤ k
  * longs BEFORE the exchange, so the distinct estimate costs one
  * k-row-per-partition shuffle — never a corpus-wide DISTINCT. The
  * ascending-sorted buffer is mutated in place at steady state: a
  * duplicate or too-large hash is one binary search, an accepted one
  * is an arraycopy shift, zero allocation once full. */
final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val n = buf.length
    if (n >= k && h >= buf(n - 1)) return buf
    // binary search in the ascending buffer; exact hit = duplicate
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < n && buf(lo) == h) return buf // distinct-only
    if (n < k) {
      val grown = new Array[Long](n + 1)
      System.arraycopy(buf, 0, grown, 0, lo)
      grown(lo) = h
      System.arraycopy(buf, lo, grown, lo + 1, n - lo)
      grown
    } else {
      System.arraycopy(buf, lo, buf, lo + 1, k - lo - 1)
      buf(lo) = h
      buf
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    y.foldLeft(x)(reduce)

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object KmvAgg {
  /** The aggregate as an untyped SQL function over a long hash
    * column. */
  def kmv(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvAgg(k), Encoders.scalaLong)
}
