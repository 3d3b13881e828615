package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches the nested-loop result exactly on random data") {
    val rnd = new scala.util.Random(42)
    val points = (1L to 500L).map(i => (i, rnd.nextInt(1000).toLong)).toDF("pid", "p")
      .repartition(5)
    val intervals = (1L to 80L).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i, lo, lo + rnd.nextInt(60).toLong)
    }.toDF("iid", "lo", "hi").repartition(3)
    for (width <- Seq(1L, 7L, 64L, 5000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(points, intervals), s"width=$width")
    }
  }

  test("negative domains bucket correctly (floor division, not truncation)") {
    val rnd = new scala.util.Random(7)
    val points = (1L to 300L).map(i => (i, rnd.nextInt(400).toLong - 200L)).toDF("pid", "p")
    val intervals = (1L to 40L).map { i =>
      val lo = rnd.nextInt(400).toLong - 200L
      (i, lo, lo + rnd.nextInt(30).toLong)
    }.toDF("iid", "lo", "hi")
    for (width <- Seq(3L, 16L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(points, intervals), s"width=$width")
    }
  }

  test("empty and inverted intervals match nothing; no duplicate pairs") {
    val points = Seq((1L, 10L), (2L, 20L)).toDF("pid", "p")
    val intervals = Seq((1L, 15L, 12L), (2L, 5L, 25L)).toDF("iid", "lo", "hi")
    val rows = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 3L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // interval 1 is inverted → dropped; interval 2 spans many buckets
    // but each point matches it exactly once
    assert(rows.sorted == Seq((1L, 2L), (2L, 2L)))
  }

  test("shared column names are rejected up front") {
    val points = Seq((1L, 10L)).toDF("id", "p")
    val intervals = Seq((1L, 0L, 5L)).toDF("id", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 3L)
    }
    assert(e.getMessage.contains("share columns"))
  }
}
