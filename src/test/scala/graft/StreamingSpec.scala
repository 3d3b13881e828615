package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventWindows

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private def batchEvents = Seq(
    (1L, ts(0), "click", 1.0),
    (1L, ts(10), "click", 2.0),
    (1L, ts(55), "view", 3.0),   // same session (gap 45 < 60)
    (2L, ts(5), "click", 4.0))
    .toDF("user_id", "ts", "event_type", "value")

  test("tumbling window aggregation (batch)") {
    val got = EventWindows.tumbling(batchEvents, "1 hour")
      .orderBy("window_start", "event_type").collect()
    // all events fall in the 00:00 hour
    assert(got.length == 2)
    assert(got.map(_.getAs[Long]("n_events")).sum == 4)
  }

  test("sliding windows: each event lands in exactly width/slide windows") {
    val got = EventWindows.sliding(batchEvents, "1 hour", "30 minutes")
      .orderBy("window_start", "event_type").collect()
    // width/slide = 2 -> total n_events doubles the event count
    assert(got.map(_.getAs[Long]("n_events")).sum == 8)
    // the 00:55 view lands in the 00:30 and 00:55->? windows: starts
    // 00:00 is NOT one of them (00:55 >= 01:00? no — 00:55 < 01:00, so
    // 00:00-01:00 contains it) — verify the two covering starts exactly
    val viewStarts = got.filter(_.getString(1) == "view")
      .map(_.getLong(0)).sorted.toSeq
    val base = ts(0).getTime / 1000
    assert(viewStarts == Seq(base, base + 1800))
  }

  test("sessionization splits on gap, not on event count") {
    val ev = Seq(
      (1L, ts(0), "a", 0.0),
      (1L, ts(10), "a", 0.0),  // gap 10 < 15 → same session
      (1L, ts(40), "a", 0.0),  // gap 30 > 15 → new session
      (2L, ts(0), "a", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val stats = EventWindows.sessionStats(ev, gapMinutes = 15)
      .orderBy("user_id", "session_idx").collect()
    assert(stats.length == 3)
    assert(stats(0).getAs[Long]("n_events") == 2)
    assert(stats(1).getAs[Long]("n_events") == 1)
    assert(stats(2).getAs[Long]("n_events") == 1)
  }

  test("the SAME windowed aggregation runs as a structured stream") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, String, Double)]
    val streamDf = source.toDF().toDF("user_id", "ts", "event_type", "value")

    val agg = EventWindows.tumblingStream(streamDf, "1 hour", "2 hours")
    val q = agg.writeStream
      .format("memory")
      .queryName("graft_stream_test")
      .outputMode("complete")
      .start()
    try {
      source.addData(
        (1L, ts(0), "click", 1.0),
        (1L, ts(30), "click", 2.0),
        (2L, ts(45), "view", 3.0))
      q.processAllAvailable()
      val got = spark.table("graft_stream_test").collect()
      assert(got.length == 2) // click + view windows
      val click = got.find(_.getAs[String]("event_type") == "click").get
      assert(click.getAs[Long]("n_events") == 2L)
      assert(click.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("round-10 curation ops run UNCHANGED as a structured stream (batch parity)") {
    // the row-local ingest/repair ops are stateless mapPartitions, so
    // the same operator code must plan as an append-mode stream and
    // produce byte-identical rows to the batch run
    import graft.operators.{Blocklist, Mojibake, WebArchive}
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, new String("café crawl text with spam".getBytes("UTF-8"), "ISO-8859-1")),
      (2L, "plain clean document"),
      (3L, "<p>html body with enough text to keep</p>"))
    def pipeline(df: org.apache.spark.sql.DataFrame) = {
      val fixed = Mojibake.repair(df, "doc_id", "text")
        .select(col("doc_id"), col("fixed").as("text"))
      Blocklist.annotate(fixed, "doc_id", "text", Seq("spam"))
    }
    val batch = pipeline(rows.toDF("doc_id", "text"))
      .orderBy("doc_id").collect().toSeq
    val source = MemoryStream[(Long, String)]
    val q = pipeline(source.toDF().toDF("doc_id", "text")).writeStream
      .format("memory").queryName("graft_curation_stream")
      .outputMode("append").start()
    try {
      source.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("graft_curation_stream")
        .orderBy("doc_id").collect().toSeq
      assert(streamed == batch)
      assert(streamed.map(_.getAs[Boolean]("clean")).toSeq == Seq(false, true, true))
    } finally q.stop()
    // html extraction is equally stream-safe
    val hsource = MemoryStream[(Long, String)]
    val hq = WebArchive.htmlTextFrame(hsource.toDF().toDF("doc_id", "html"),
      "doc_id", "html").writeStream
      .format("memory").queryName("graft_html_stream")
      .outputMode("append").start()
    try {
      hsource.addData((9L, "<p>a &amp; b</p>"))
      hq.processAllAvailable()
      assert(spark.table("graft_html_stream").collect()
        .map(_.getString(1)).toSeq == Seq("a & b"))
    } finally hq.stop()
  }

  test("streaming dedup drops within-watermark duplicate event ids") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Double)]
    val streamDf = source.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "1 hour")

    val q = EventWindows.dedupEvents(streamDf, "event_id").writeStream
      .format("memory").queryName("graft_dedup_test")
      .outputMode("append").start()
    try {
      source.addData((1L, ts(0), 1.0), (1L, ts(1), 1.0), (2L, ts(2), 2.0))
      q.processAllAvailable()
      source.addData((2L, ts(3), 2.0), (3L, ts(4), 3.0)) // 2 is a re-delivery
      q.processAllAvailable()
      val ids = spark.table("graft_dedup_test").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("dedupEvents on a batch frame is plain dropDuplicates") {
    val df = Seq((1L, ts(0), 1.0), (1L, ts(5), 1.0), (2L, ts(1), 2.0))
      .toDF("event_id", "ts", "value")
    assert(EventWindows.dedupEvents(df, "event_id").count() == 2)
  }

  test("correlate: stream-stream interval join pairs events within the window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val convs = MemoryStream[(Long, Timestamp)]
    val cDf = clicks.toDF().toDF("user_id", "ts").withWatermark("ts", "1 hour")
    val vDf = convs.toDF().toDF("user_id", "ts").withWatermark("ts", "1 hour")

    val q = EventWindows.correlate(cDf, vDf, "user_id", "ts", withinSeconds = 600)
      .writeStream.format("memory").queryName("graft_correlate_test")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(0)))
      convs.addData((1L, ts(5)), (2L, ts(30)), (1L, ts(2)))
      q.processAllAvailable()
      val rows = spark.table("graft_correlate_test")
        .collect().map(r => (r.getLong(0), r.getTimestamp(3)))
      // user 1: both conversions within 10 min; user 2's at +30 min misses
      assert(rows.count(_._1 == 1L) == 2)
      assert(!rows.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("correlate left_outer: unmatched clicks emit with nulls once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val convs = MemoryStream[(Long, Timestamp)]
    val cDf = clicks.toDF().toDF("user_id", "ts").withWatermark("ts", "10 minutes")
    val vDf = convs.toDF().toDF("user_id", "ts").withWatermark("ts", "10 minutes")

    val q = EventWindows.correlate(cDf, vDf, "user_id", "ts",
        withinSeconds = 600, how = "left_outer")
      .writeStream.format("memory").queryName("graft_correlate_outer_test")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(0)))
      convs.addData((1L, ts(5)))
      q.processAllAvailable()
      // advance both watermarks far past user 2's join horizon so the
      // unmatched click is finalized and emitted
      clicks.addData((9L, Timestamp.valueOf("2024-01-01 02:00:00")))
      convs.addData((9L, Timestamp.valueOf("2024-01-01 02:00:00")))
      q.processAllAvailable()
      val rows = spark.table("graft_correlate_outer_test")
        .collect().map(r => (r.getLong(0), Option(r.getTimestamp(3))))
      assert(rows.exists { case (u, m) => u == 1L && m.isDefined })
      assert(rows.exists { case (u, m) => u == 2L && m.isEmpty },
        s"unmatched click should surface with a null match: ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("correlate rejects right/full outer loudly") {
    val l = Seq((1L, ts(0))).toDF("user_id", "ts")
    val e = intercept[IllegalArgumentException] {
      EventWindows.correlate(l, l, "user_id", "ts", 600, how = "full_outer")
    }
    assert(e.getMessage.contains("left_outer"))
  }

  test("correlate works identically on batch frames") {
    val l = Seq((1L, ts(0))).toDF("user_id", "ts")
    val r = Seq((1L, ts(5)), (1L, ts(20))).toDF("user_id", "ts")
    val got = EventWindows.correlate(l, r, "user_id", "ts", withinSeconds = 600)
    assert(got.count() == 1)
  }

  test("correlate rejects left columns that collide with prefixed right names") {
    val l = Seq((1L, ts(0), "x")).toDF("user_id", "ts", "r_ts")
    val r = Seq((1L, ts(5))).toDF("user_id", "ts")
    val e = intercept[IllegalArgumentException] {
      EventWindows.correlate(l, r, "user_id", "ts", withinSeconds = 600)
    }
    assert(e.getMessage.contains("collide"))
  }

  test("stream-static enrich broadcasts the dimension and keeps unmatched") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("dim_user", "tier")
    val source = MemoryStream[(Long, Timestamp, Double)]
    val streamDf = source.toDF().toDF("user_id", "ts", "value")

    val q = EventWindows.enrich(streamDf, dim, "user_id", "dim_user").writeStream
      .format("memory").queryName("graft_enrich_test")
      .outputMode("append").start()
    try {
      source.addData((1L, ts(0), 1.0), (9L, ts(1), 9.0))
      q.processAllAvailable()
      val rows = spark.table("graft_enrich_test").collect()
      assert(rows.length == 2) // left join: the unmatched user survives
      assert(rows.find(_.getLong(0) == 1L).get.getAs[String]("tier") == "gold")
      assert(rows.find(_.getLong(0) == 9L).get.isNullAt(rows(0).fieldIndex("tier")))
    } finally q.stop()
  }

  test("funnel: first-touch anchor, strict step order, window bound") {
    val ev = Seq(
      // user 1 completes: view 00, click 10, purchase 20
      (1L, ts(0), "view", 0.0), (1L, ts(10), "click", 0.0),
      (1L, ts(20), "purchase", 0.0),
      // a later view must NOT re-anchor (first-touch)
      (1L, ts(15), "view", 0.0),
      // user 2: purchase BEFORE click -> step 3 not reached
      (2L, ts(0), "view", 0.0), (2L, ts(20), "click", 0.0),
      (2L, ts(10), "purchase", 0.0),
      // user 3: click outside the 30-minute window
      (3L, ts(0), "view", 0.0), (3L, ts(45), "click", 0.0),
      // user 4: no view -> not in the funnel at all
      (4L, ts(0), "click", 0.0), (4L, ts(5), "purchase", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val f = EventWindows.funnel(ev, Seq("view", "click", "purchase"),
      withinSeconds = 30 * 60)
    val rows = f.collect().map(r => (r.getLong(0),
      !r.isNullAt(1), !r.isNullAt(2), !r.isNullAt(3))).sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, true, true, true),
      (2L, true, true, false), // purchase precedes click: strict order
      (3L, true, false, false))) // click at +45 min > 30-min window
    // completer's chain is the EARLIEST valid one
    val u1 = f.where(col("user_id") === 1L).collect().head
    assert(u1.getTimestamp(1) === ts(0) && u1.getTimestamp(2) === ts(10) &&
      u1.getTimestamp(3) === ts(20))
  }

  test("funnel loud contracts: step count, duplicates, window") {
    val ev = batchEvents
    intercept[IllegalArgumentException] {
      EventWindows.funnel(ev, Seq("view"), 60)
    }
    intercept[IllegalArgumentException] {
      EventWindows.funnel(ev, Seq("view", "view"), 60)
    }
    intercept[IllegalArgumentException] {
      EventWindows.funnel(ev, Seq("view", "click"), 0)
    }
  }

  test("retention: cohort day from first event, distinct users per offset") {
    def day(d: Int, h: Int = 12): Timestamp =
      Timestamp.valueOf(f"2024-01-${d + 1}%02d $h%02d:00:00")
    val ev = Seq(
      // user 1: first day 0, active days 0, 1, 3 (two events day 1)
      (1L, day(0)), (1L, day(1)), (1L, day(1, 18)), (1L, day(3)),
      // user 2: first day 1, active days 1, 2
      (2L, day(1)), (2L, day(2)),
      // user 3: only day 0
      (3L, day(0)))
      .toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val got = EventWindows.retention(ev, maxOffsetDays = 7)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0, 2L), // users 1 and 3 on their day 0
      ("2024-01-01", 1, 1L), // user 1 on day 1 (deduped within the day)
      ("2024-01-01", 3, 1L),
      ("2024-01-02", 0, 1L), // user 2's own cohort
      ("2024-01-02", 1, 1L)))
  }

  test("trained multi-class scoring runs UNCHANGED as a stream (census parity)") {
    // StreamScore: scoring is stateless row-local margins, so the SAME
    // trained model + census aggregation must run under readStream and
    // reproduce the batch census row-for-row
    import graft.functions.DsirFeatures
    import graft.operators.MultiClass
    import graft.streaming.StreamScore
    implicit val sqlCtx = spark.sqlContext
    val train = Seq.tabulate(24) { i =>
      val lab = if (i % 2 == 0) "pos" else "neg"
      val txt = if (i % 2 == 0) s"good fast clean text $i" else s"bad slow spam text $i"
      (i.toLong, txt, lab)
    }.toDF("doc_id", "text", "lab")
    val feats = array_distinct(
      DsirFeatures.dsirBuckets(col("text"), Seq(1), 64, 13L))
    val m = MultiClass.train(train, feats, "lab", Seq("pos", "neg"), 64,
      rounds = 5)

    val scoreRows = Seq(
      (10L, ts(5), "good fast clean text"),
      (11L, ts(20), "bad slow spam text"),
      (12L, ts(50), "good fast clean text"),
      (13L, ts(59), "bad slow spam text"))
    val batchDf = scoreRows.toDF("doc_id", "ts", "text")
    val batch = StreamScore.predLabelCensus(batchDf, feats, m, "ts", "30 minutes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted

    val source = MemoryStream[(Long, Timestamp, String)]
    val streamDf = source.toDF().toDF("doc_id", "ts", "text")
    val q = StreamScore.predLabelCensusStream(streamDf, feats, m,
        "ts", "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("graft_mc_stream")
      .outputMode("complete").start()
    try {
      source.addData(scoreRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("graft_mc_stream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      assert(streamed.toSeq === batch.toSeq)
      // both windows saw one of each label
      assert(batch.map(_._3).sum === 4L)
      assert(batch.count(_._2 == "pos") === 2)
    } finally q.stop()
  }

  test("video keyframe census: the stream run reproduces the batch census") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 4 videos across 2 ingest hours, both containers
    val specRows = Seq(
      (2L, 3, Timestamp.valueOf("2024-01-01 00:10:00")),
      (3L, 2, Timestamp.valueOf("2024-01-01 00:40:00")),
      (4L, 2, Timestamp.valueOf("2024-01-01 01:05:00")),
      (5L, 4, Timestamp.valueOf("2024-01-01 01:30:00")))
    val spec = specRows.toDF("id", "nf", "ts").withColumn("w", lit(48))
    val media = graft.operators.Multimodal
      .encodeVp8Video(spec, "id", "nf", "w", withInterframes = true)
      .join(spec.select(col("id").as("media_id"), col("ts")), "media_id")
      .select(col("media_id"), col("data"), col("ts"))
    val batch = graft.operators.Multimodal.videoKeyframeCensus(media, "ts")
      .orderBy("window_start", "format").collect().toSeq
    assert(batch.map(_.getLong(2)).sum == 11) // total keyframes = sum nf
    val rows = media.as[(Long, Array[Byte], Timestamp)].collect().toSeq
    val source = MemoryStream[(Long, Array[Byte], Timestamp)]
    val streamMedia = source.toDF().toDF("media_id", "data", "ts")
      .withWatermark("ts", "2 hours")
    val q = graft.operators.Multimodal.videoKeyframeCensus(streamMedia, "ts")
      .writeStream.format("memory").queryName("graft_video_census")
      .outputMode("complete").start()
    try {
      source.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("graft_video_census")
        .orderBy("window_start", "format").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
