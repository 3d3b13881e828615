package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{EventWindows, StatefulFunnel}

/** [[graft.streaming.StatefulFunnel]] — the custom-state funnel:
  * batch parity with the join formulation, the greedy chain's edge
  * cases, window-horizon pruning, and streaming timeout emission. */
class StatefulFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val steps = Seq("view", "click", "purchase")

  test("batch mode equals the join formulation on the real fixture") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val joinForm = EventWindows.funnel(ev, steps, withinSeconds = 86400)
      .collect().map { r =>
        val reached = if (!r.isNullAt(3)) 3 else if (!r.isNullAt(2)) 2 else 1
        (r.getLong(0), reached, r.getTimestamp(1).getTime)
      }.toSet
    val stateForm = StatefulFunnel.funnelStats(ev, steps,
        withinSeconds = 86400)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(stateForm === joinForm)
  }

  test("chain: strict order, window bound, earliest-candidate choice") {
    val w = 30 * 60000L
    // anchor 0; click candidates 10, 5 -> picks 5; purchase before the
    // click is ignored, one at 20 completes
    assert(StatefulFunnel.chain(Seq(Seq(ts(0).getTime),
      Seq(ts(10).getTime, ts(5).getTime),
      Seq(ts(3).getTime, ts(20).getTime)), w) ===
      Some((3, ts(0).getTime, ts(20).getTime)))
    // click outside the window: depth 1
    assert(StatefulFunnel.chain(Seq(Seq(ts(0).getTime),
      Seq(ts(45).getTime), Seq()), w) ===
      Some((1, ts(0).getTime, ts(0).getTime)))
    // no anchor: no row
    assert(StatefulFunnel.chain(Seq(Seq(), Seq(ts(5).getTime), Seq()), w)
      === None)
    // a SECOND step-1 event lowers the anchor and shrinks the window:
    // click at 40 fits the old anchor (20+30) but not the new (0+30)
    assert(StatefulFunnel.chain(Seq(
      Seq(ts(20).getTime, ts(0).getTime), Seq(ts(40).getTime), Seq()), w)
      === Some((1, ts(0).getTime, ts(0).getTime)))
  }

  test("streaming: completion emits on the watermark timeout; late step events count") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, String)]
    val stream = source.toDF().toDF("user_id", "ts", "event_type")
      .withWatermark("ts", "30 minutes")
    val out = StatefulFunnel.funnelStats(stream, steps,
      withinSeconds = 30 * 60, emitOpen = false)
    val q = out.writeStream.format("memory")
      .queryName("graft_stateful_funnel").outputMode("append").start()
    try {
      // batch 1: view@0 and purchase@20 (purchase precedes any click —
      // must NOT complete the funnel yet)
      source.addData((1L, ts(0), "view"), (1L, ts(20), "purchase"))
      q.processAllAvailable()
      assert(spark.table("graft_stateful_funnel").count() === 0)

      // batch 2: the click arrives LATE (ts 10, inside the watermark
      // slack) — the buffered purchase@20 now completes the chain
      source.addData((1L, ts(10), "click"))
      q.processAllAvailable()
      assert(spark.table("graft_stateful_funnel").count() === 0)

      // advance the watermark past anchor + window (0 + 30) + slack
      // (30): user 1 finalizes via the event-time timeout
      source.addData((99L, ts(70), "view"))
      q.processAllAvailable()
      source.addData((99L, ts(80), "view"))
      q.processAllAvailable()
      val rows = spark.table("graft_stateful_funnel")
        .where(col("user_id") === 1L).collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Int]("steps_reached") === 3)
      assert(rows.head.getAs[Long]("t1_ms") === ts(0).getTime)
      assert(rows.head.getAs[Long]("t_last_ms") === ts(20).getTime)
    } finally q.stop()
  }

  test("pruning: events past the current anchor's window never enter state") {
    // exercised through batch equality on a crafted frame where the
    // out-of-window events dominate: results must match the join form
    val ev = (Seq((7L, ts(0), "view")) ++
      (1 to 50).map(i => (7L, ts(100 + i), "click")) ++
      Seq((7L, ts(10), "click"), (7L, ts(20), "purchase")))
      .toDF("user_id", "ts", "event_type")
    val got = StatefulFunnel.funnelStats(ev, steps, withinSeconds = 30 * 60)
      .collect().head
    assert(got.getAs[Int]("steps_reached") === 3)
    assert(got.getAs[Long]("t_last_ms") === ts(20).getTime)
  }

  test("loud contracts: step count, duplicate steps") {
    val ev = Seq((1L, ts(0), "view")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      StatefulFunnel.funnelStats(ev, Seq("view"), 60)
    }
    intercept[IllegalArgumentException] {
      StatefulFunnel.funnelStats(ev, Seq("view", "view"), 60)
    }
  }
}
