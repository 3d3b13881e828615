package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // left: user trades; right: user quotes (the classic asof shape)
  private def left = Seq(
    (1L, "u1", ts(100), 10.0),
    (2L, "u1", ts(200), 20.0),
    (3L, "u1", ts(50), 5.0), // before any quote
    (4L, "u2", ts(150), 15.0)).toDF("trade_id", "user", "ts", "qty")

  private def right = Seq(
    ("u1", ts(90), 1.0),
    ("u1", ts(100), 2.0), // exact match at left ts=100
    ("u1", ts(180), 3.0),
    ("u2", ts(140), 4.0),
    ("u3", ts(10), 9.0)).toDF("user", "ts", "px")

  private def run(direction: String, tol: Option[Long] = None) =
    AsofJoin.mergeAsof(left, right, on = "ts", by = "user",
        valueCols = Seq("px"), direction = direction, toleranceSeconds = tol)
      .orderBy("trade_id").collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble))

  test("backward asof matches latest right row at-or-before, null if none") {
    val got = run("backward").toMap
    assert(got(1L) == Some(2.0)) // exact match wins over earlier 90
    assert(got(2L) == Some(3.0)) // 180 <= 200
    assert(got(3L) == None)      // no quote at/before 50
    assert(got(4L) == Some(4.0)) // per-user isolation (u3 never leaks)
  }

  test("forward asof matches earliest right row at-or-after") {
    val got = run("forward").toMap
    assert(got(1L) == Some(2.0)) // exact match still wins
    assert(got(2L) == None)      // nothing after 200 for u1
    assert(got(3L) == Some(1.0)) // 90 is the first at/after 50
  }

  test("tolerance nulls out matches farther than the bound") {
    val got = run("backward", tol = Some(10L)).toMap
    assert(got(1L) == Some(2.0)) // gap 0 <= 10
    assert(got(2L) == None)      // gap 20 > 10
  }

  test("left columns and row count are preserved") {
    val out = AsofJoin.mergeAsof(left, right, "ts", "user", Seq("px"))
    assert(out.count() == left.count())
    assert(out.columns.toSeq == (left.columns.toSeq :+ "px"))
  }

  test("value-column name collisions are rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.mergeAsof(left, right.withColumnRenamed("px", "qty"),
        "ts", "user", Seq("qty"))
    }
  }

  test("plan contains no join node (single window, no range cross-join)") {
    val plan = AsofJoin.mergeAsof(left, right, "ts", "user", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"))
  }

  test("bucketed variant matches mergeAsof on the reference fixture") {
    for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(10L))) {
      val base = AsofJoin.mergeAsof(left, right, "ts", "user",
          Seq("px"), dir, tol)
        .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
      // bucketSeconds=60: the fixture spans several buckets, so carries
      // are exercised (e.g. trade at 200 matched by quote at 180 across
      // the 180/240 boundary... and at 50 with no earlier quote).
      val bucketed = AsofJoin.mergeAsofBucketed(left, right, "ts", "user",
          Seq("px"), dir, tol, bucketSeconds = 60L)
        .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
      assert(bucketed == base, s"dir=$dir tol=$tol")
    }
  }

  test("bucketed variant: one hot key fans out and still agrees") {
    // one key, 2000 left rows + 500 right rows over 5000s — with
    // bucketSeconds=500 the hot key spreads over ~10 window partitions
    // instead of 1.
    val hotLeft = (1 to 2000)
      .map(i => (i.toLong, "hot", ts(i.toLong * 5 / 2), i.toDouble))
      .toDF("trade_id", "user", "ts", "qty")
    val hotRight = (0 until 500)
      .map(i => ("hot", ts(i * 10L + 1), i.toDouble))
      .toDF("user", "ts", "px")
    val base = AsofJoin.mergeAsof(hotLeft, hotRight, "ts", "user", Seq("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    val bucketed = AsofJoin.mergeAsofBucketed(
        hotLeft, hotRight, "ts", "user", Seq("px"), bucketSeconds = 500L)
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(bucketed == base)
    // and the within-bucket window really partitions on the time bucket
    val plan = AsofJoin.mergeAsofBucketed(
        hotLeft, hotRight, "ts", "user", Seq("px"), bucketSeconds = 500L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bucket"), plan)
  }
}
