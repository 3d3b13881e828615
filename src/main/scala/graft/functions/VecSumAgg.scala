package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector sum over an `array<double>` column, as a typed
  * Spark [[Aggregator]] — the missing built-in for embedding math
  * (Spark's `sum` is scalar-only; summing vectors otherwise forces a
  * `posexplode` by dimension, which multiplies the shuffle row count by
  * the embedding width).
  *
  * Scale shape: this runs as PARTIAL aggregation — each map task folds
  * its partition's vectors into one dim-length buffer per group before
  * the exchange, so computing k-means centroids over a 100 TB corpus
  * shuffles `groups × partitions` arrays instead of `rows × dim`
  * exploded doubles (for dim=64 that is ~64× fewer shuffled values, and
  * the buffer adds are in-place with zero allocation at steady state).
  *
  * Null semantics: null vectors are skipped (pandas-style `skipna`);
  * the result is null when no non-null vector was seen (SQL
  * convention, matching built-in `sum`). A dimension mismatch inside
  * one group is a data error and fails fast with a clear message —
  * silently truncating or padding would corrupt every centroid
  * downstream. Null ELEMENTS inside a vector and ZERO-LENGTH vectors
  * are rejected the same way (an embedding with missing dimensions is
  * corrupt, not zero — and a tolerated empty vector would be
  * indistinguishable from "no input" in the null result).
  */
final class VecSumAgg extends Aggregator[Seq[java.lang.Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.empty

  private def checkedAdd(buf: Array[Double], v: Seq[java.lang.Double]): Array[Double] = {
    if (buf.length != v.length) {
      throw new IllegalArgumentException(
        s"vec_sum: dimension mismatch — buffer has ${buf.length}, input has ${v.length}")
    }
    var i = 0
    val it = v.iterator
    while (it.hasNext) {
      val x = it.next()
      if (x == null) {
        throw new IllegalArgumentException(
          s"vec_sum: null element at dimension $i — corrupt embedding")
      }
      buf(i) += x.doubleValue()
      i += 1
    }
    buf
  }

  override def reduce(buf: Array[Double], v: Seq[java.lang.Double]): Array[Double] = {
    if (v == null) buf
    // A zero-length vector is corrupt data, same contract as a null
    // element — and silently treating it as "no input" would conflate
    // an all-empty group with an all-null group at finish().
    else if (v.isEmpty) throw new IllegalArgumentException(
      "vec_sum: zero-length vector — corrupt embedding")
    else if (buf.length == 0) checkedAdd(new Array[Double](v.length), v)
    else checkedAdd(buf, v)
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] =
    if (x.length == 0) y
    else if (y.length == 0) x
    else {
      if (x.length != y.length) {
        throw new IllegalArgumentException(
          s"vec_sum: dimension mismatch across partitions — ${x.length} vs ${y.length}")
      }
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

  // Empty buffer = no non-null input: null result, like built-in sum.
  override def finish(r: Array[Double]): Seq[Double] =
    if (r.length == 0) null else r.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VecSumAgg {
  /** `vec_sum(col)` as an untyped aggregate function over an
    * `array<double>` column, usable inside `df.agg(...)`. */
  def vecSum: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new VecSumAgg(),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[java.lang.Double]]())
}
