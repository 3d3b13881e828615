package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvAgg
import graft.operators.Sketches

class KmvAggSpec extends SparkSpec {
  import spark.implicits._

  test("reduce keeps the k smallest DISTINCT values, sorted ascending") {
    val a = new KmvAgg(3)
    val buf = Seq(50L, 10L, 30L, 10L, 40L, 20L, 10L).foldLeft(a.zero)(a.reduce)
    assert(buf.toSeq == Seq(10L, 20L, 30L))
    // merge behaves like reduce over the other side
    val other = Seq(5L, 25L, 30L).foldLeft(a.zero)(a.reduce)
    assert(a.merge(buf, other).toSeq == Seq(5L, 10L, 20L))
  }

  test("under-filled sketch is the exact distinct set") {
    val a = new KmvAgg(10)
    val buf = Seq(7L, 3L, 7L, 3L, 9L).foldLeft(a.zero)(a.reduce)
    assert(buf.toSeq == Seq(3L, 7L, 9L))
  }

  test("partition-invariant: same sketch at 1 and 13 partitions") {
    val data = (0 until 5000).map(i => (i * 37L) % 997L)
    val sk = KmvAgg.kmv(16)
    def sketchOf(parts: Int) =
      data.toDF("h").repartition(parts).agg(sk(col("h"))).as[Seq[Long]].head()
    assert(sketchOf(1) == sketchOf(13))
    // 997 distinct values; the 16 smallest of (i*37 % 997) are 0..15·?
    assert(sketchOf(1).size == 16)
  }

  test("kmvDistinct: exact when under k, estimator formula when full") {
    val small = (1 to 5).map(_.toLong).toDF("x")
    val exact = Sketches.kmvDistinct(small, col("x"), k = 16, hashSpace = 100.0)
      .collect().head
    assert(exact.getInt(0) == 5 && exact.isNullAt(1) && exact.getDouble(2) == 5.0)

    // full: 0..99 hashed by identity over space 100 -> kth = 15,
    // est = 15*100/15 = 100 (identity hash makes the formula exact-ish)
    val big = (0 until 100).map(_.toLong).toDF("x")
    val full = Sketches.kmvDistinct(big, col("x"), k = 16, hashSpace = 100.0)
      .collect().head
    assert(full.getInt(0) == 16 && full.getLong(1) == 15L)
    assert(math.abs(full.getDouble(2) - 100.0) < 1e-9)
  }
}
