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
  * The buffer is a descending-sorted Vector capped at k — small,
  * immutable, and Encoder-friendly.
  */
final class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Scored] = Vector.empty

  // java.lang.Double.compare, not `>`: NaN must rank ABOVE every real
  // sim (Spark's descending sort order treats NaN as largest), so this
  // aggregate and the window/row_number formulation agree on inputs
  // with NaN similarities (e.g. zero vectors).
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.sim, b.sim)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.size >= k && !better(a, buf.last)) buf
    else {
      val i = buf.indexWhere(better(a, _)) match {
        case -1 => buf.size
        case j  => j
      }
      val grown = (buf.take(i) :+ a) ++ buf.drop(i)
      if (grown.size > k) grown.take(k) else grown
    }

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    y.foldLeft(x)(reduce)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopKAgg {
  /** The aggregate as an untyped SQL function over (sim, id) columns. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k), Encoders.product[Scored])
}
