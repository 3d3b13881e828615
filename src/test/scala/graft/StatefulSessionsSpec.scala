package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{EventWindows, StatefulSessions}

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("batch mode (emitOpen) equals the lag-window sessionStats") {
    val ev = Seq(
      (1L, ts(0), "a", 1.0),
      (1L, ts(10), "a", 2.0),  // gap 10 <= 15 → same session
      (1L, ts(40), "a", 3.0),  // gap 30 > 15 → new session
      (2L, ts(5), "a", 4.0))
      .toDF("user_id", "ts", "event_type", "value")

    val got = StatefulSessions.sessionStats(ev, gapMinutes = 15)
      .orderBy("user_id", "start_ts")
      .select("user_id", "start_ts", "end_ts", "n_events")
      .collect()
    val want = EventWindows.sessionStats(ev, gapMinutes = 15)
      .orderBy("user_id", "start_ts")
      .select("user_id", "start_ts", "end_ts", "n_events")
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("batch mode sums session values") {
    val ev = Seq(
      (1L, ts(0), "a", 1.5),
      (1L, ts(5), "a", 2.5))
      .toDF("user_id", "ts", "event_type", "value")
    val row = StatefulSessions.sessionStats(ev, gapMinutes = 15).collect().head
    assert(row.getAs[Long]("n_events") == 2L)
    assert(row.getAs[Double]("sum_value") == 4.0)
  }

  test("streaming: gap closes a session mid-stream; watermark timeout closes the trailing one") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Double)]
    val stream = source.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")

    val sessions = StatefulSessions.sessionStats(
      stream, gapMinutes = 15, emitOpen = false)
    val q = sessions.writeStream
      .format("memory")
      .queryName("graft_stateful_sessions")
      .outputMode("append")
      .start()
    try {
      // Batch 1: an open session for user 1 (events at minute 0 and 10).
      source.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0))
      q.processAllAvailable()
      assert(spark.table("graft_stateful_sessions").count() == 0)

      // Batch 2: an event 110 min later — the gap closes session 1
      // immediately (emitted via the data path, not the timeout).
      source.addData((1L, ts(120), 3.0))
      q.processAllAvailable()
      val afterGap = spark.table("graft_stateful_sessions").collect()
      assert(afterGap.length == 1)
      assert(afterGap.head.getAs[Long]("n_events") == 2L)
      assert(afterGap.head.getAs[Double]("sum_value") == 3.0)

      // Batches 3+4 (other user) push the watermark past
      // minute 120 + gap → user 1's trailing session times out.
      source.addData((99L, ts(200), 0.0))
      q.processAllAvailable()
      source.addData((99L, ts(210), 0.0))
      q.processAllAvailable()
      val user1 = spark.table("graft_stateful_sessions")
        .where(col("user_id") === 1L).orderBy("start_ts").collect()
      assert(user1.length == 2)
      assert(user1(1).getAs[Long]("n_events") == 1L)
      assert(user1(1).getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming: a cross-batch late event extends the open session DOWNWARD") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Double)]
    // generous watermark delay so the late event is still on-time
    val stream = source.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "2 hours")

    val q = StatefulSessions.sessionStats(stream, gapMinutes = 15, emitOpen = false)
      .writeStream.format("memory").queryName("graft_late_sessions")
      .outputMode("append").start()
    try {
      source.addData((1L, ts(60), 1.0))
      q.processAllAvailable()
      // late event 10 min BEFORE the session start — merges, lowers start
      source.addData((1L, ts(50), 2.0))
      q.processAllAvailable()
      // an event far before (more than a gap): its own singleton session
      source.addData((1L, ts(10), 7.0))
      q.processAllAvailable()
      val singleton = spark.table("graft_late_sessions").collect()
      assert(singleton.length == 1)
      assert(singleton.head.getAs[Double]("sum_value") == 7.0)

      // close the open session via the gap path; start must be ts(50)
      source.addData((1L, Timestamp.valueOf("2024-01-01 05:00:00"), 0.0))
      q.processAllAvailable()
      val closed = spark.table("graft_late_sessions")
        .where(col("n_events") === 2L).collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Long]("start_ts") == ts(50).getTime / 1000)
      assert(closed.head.getAs[Long]("end_ts") == ts(60).getTime / 1000)
      assert(closed.head.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("pinned divergence: a far-late pair SPLIT ACROSS batches emits two singletons") {
    // Same events as the merge test above, but the far-late pair
    // arrives in SEPARATE micro-batches. The secondary session cannot
    // survive a batch boundary (one state struct per key — see the
    // far-late contract in StatefulSessions), so streaming emits two
    // singleton sessions where batch mode emits one merged pair. This
    // test pins that exact delta; if cross-batch merging is ever
    // implemented, it should start failing.
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Double)]
    val stream = source.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "6 hours")
    val q = StatefulSessions.sessionStats(stream, gapMinutes = 15, emitOpen = false)
      .writeStream.format("memory").queryName("graft_farlate_split")
      .outputMode("append").start()
    try {
      source.addData((1L, ts(120), 1.0))
      q.processAllAvailable()
      source.addData((1L, ts(10), 2.0))
      q.processAllAvailable()
      source.addData((1L, ts(15), 3.0))
      q.processAllAvailable()
      val got = spark.table("graft_farlate_split").orderBy("start_ts")
        .select("start_ts", "end_ts", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == Seq(
        (ts(10).getTime / 1000, ts(10).getTime / 1000, 1L, 2.0),
        (ts(15).getTime / 1000, ts(15).getTime / 1000, 1L, 3.0)))
      // batch replay of the SAME events merges the pair — the delta
      val batch = StatefulSessions.sessionStats(
          Seq((1L, ts(120), "a", 1.0), (1L, ts(10), "a", 2.0), (1L, ts(15), "a", 3.0))
            .toDF("user_id", "ts", "event_type", "value"),
          gapMinutes = 15)
        .orderBy("start_ts")
        .select("start_ts", "end_ts", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(batch.toSeq == Seq(
        (ts(10).getTime / 1000, ts(15).getTime / 1000, 2L, 5.0),
        (ts(120).getTime / 1000, ts(120).getTime / 1000, 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming: far-late events within a gap of each other MERGE (batch parity)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Double)]
    val stream = source.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "6 hours")

    val q = StatefulSessions.sessionStats(stream, gapMinutes = 15, emitOpen = false)
      .writeStream.format("memory").queryName("graft_farlate_sessions")
      .outputMode("append").start()
    try {
      // open session at minute 120
      source.addData((1L, ts(120), 1.0))
      q.processAllAvailable()
      // one micro-batch carrying TWO far-late events 5 min apart — the
      // batch lag-window would make them ONE session, so this must too
      source.addData((1L, ts(10), 2.0), (1L, ts(15), 3.0))
      q.processAllAvailable()
      val merged = spark.table("graft_farlate_sessions").collect()
      assert(merged.length == 1)
      assert(merged.head.getAs[Long]("n_events") == 2L)
      assert(merged.head.getAs[Double]("sum_value") == 5.0)
      assert(merged.head.getAs[Long]("start_ts") == ts(10).getTime / 1000)
      assert(merged.head.getAs[Long]("end_ts") == ts(15).getTime / 1000)
    } finally q.stop()
  }
}
