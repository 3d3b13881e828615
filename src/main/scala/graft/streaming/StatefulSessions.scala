package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * streaming analog of [[EventWindows.sessionize]]'s sort-based batch
  * formulation (reference capability: grouped session rollups; cf.
  * /root/reference/dataframe/core.py:596-603 grouped split_out output).
  *
  * Why custom state instead of the lag-window form: a stream can't sort
  * all history per user; instead each user key holds ONE open-session
  * struct (start, end, count, sum) that is folded forward as events
  * arrive. A session closes — and is emitted downstream, append-mode —
  * when a later event of the same user arrives more than `gapMinutes`
  * after the session's end, or when the event-time watermark passes
  * end + gap (the `GroupStateTimeout.EventTimeTimeout` path: no more
  * on-time events can extend the session, so it is final).
  *
  * Scale: state is O(active users), one small struct each — bounded by
  * the watermark horizon, not by history length. The only shuffle is the
  * groupByKey on user_id, identical to any grouped aggregation at
  * 100 TB. The typed fold exits whole-stage codegen (inherent to
  * arbitrary-state operators); keep it for genuinely stateful session
  * logic and use [[EventWindows.sessionize]] for batch.
  */
object StatefulSessions {

  /** Input event. Gap arithmetic runs in MILLISECONDS (matching the
    * batch formulation's `unix_millis` test — whole-second truncation
    * would merge sessions whose gap overshoots by under a second);
    * emitted session bounds are floor-seconds. */
  case class Ev(user_id: Long, ts: Timestamp, value: Double)

  /** Per-user open-session state held between micro-batches
    * (start/end in epoch ms). */
  case class Open(start: Long, end: Long, n: Long, sum: Double)

  /** A closed session (what the operator emits). */
  case class Session(
      user_id: Long, start_ts: Long, end_ts: Long, n_events: Long,
      sum_value: Double)

  /** Fold events into sessions. `emitOpen = true` is the batch mode:
    * end-of-data closes every session, so trailing open sessions are
    * emitted too and the result equals [[EventWindows.sessionStats]].
    * `emitOpen = false` is the streaming mode: trailing sessions stay
    * in state and are emitted by the event-time timeout once the
    * watermark passes session end + gap (input must carry
    * `withWatermark("ts", ...)`).
    *
    * FAR-LATE CONTRACT (the one pinned batch/stream divergence):
    * far-late events — more than a gap BEFORE the open session — merge
    * with each other within a micro-batch (batch parity, see
    * `openBefore` below), but NOT across micro-batches: per-key state
    * holds exactly one open-session struct whose timeout slot belongs
    * to the open session, so each batch's secondary session closes at
    * batch end. A far-late pair split across two batches therefore
    * emits two singleton sessions where the batch formulation emits
    * one merged session — same event totals, different grouping; the
    * exact delta is asserted in StatefulSessionsSpec ("pinned
    * divergence"). Holding a second struct per key would double every
    * key's state for an event class the watermark is supposed to
    * bound; pipelines that need exact far-late grouping should widen
    * the watermark (making those events on-time) or reconcile in
    * batch. */
  def sessions(
      events: Dataset[Ev], gapMinutes: Int,
      emitOpen: Boolean): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    def close(uid: Long, s: Open): Session =
      Session(uid, Math.floorDiv(s.start, 1000L), Math.floorDiv(s.end, 1000L), s.n, s.sum)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            // Watermark passed end + gap: the session is final.
            val s = state.get
            state.remove()
            Iterator.single(close(uid, s))
          } else {
            // Events within one micro-batch (or the whole group, in
            // batch mode) are sorted here; cross-batch reordering is
            // bounded by the watermark.
            val sorted = it.toArray.sortBy(_.ts.getTime)
            val out = Vector.newBuilder[Session]
            var open = state.getOption
            // Far-late events (more than a gap BEFORE the open session)
            // fold into their own secondary session so that several of
            // them within a gap of each other MERGE — matching the batch
            // lag-window semantics — instead of each emitting a
            // singleton. Ascending order keeps at most one such session
            // live. NOTE the open session's start can DROP after a
            // far-late event was routed here (a later event merging
            // downward), so the two may touch by the end of the batch —
            // the final emission below re-checks and merges them.
            var openBefore: Option[Open] = None
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                // Merge iff within gap of the session INTERVAL — a late
                // (cross-batch) event can extend the session downward,
                // so start must take the min.
                case Some(s) if t >= s.start - gapMs && t - s.end <= gapMs =>
                  open = Some(Open(
                    math.min(t, s.start), math.max(t, s.end), s.n + 1, s.sum + e.value))
                case Some(s) if t < s.start - gapMs =>
                  openBefore match {
                    case Some(b) if t - b.end <= gapMs =>
                      openBefore = Some(Open(b.start, t, b.n + 1, b.sum + e.value))
                    case Some(b) =>
                      out += close(uid, b)
                      openBefore = Some(Open(t, t, 1L, e.value))
                    case None =>
                      openBefore = Some(Open(t, t, 1L, e.value))
                  }
                case Some(s) =>
                  out += close(uid, s)
                  open = Some(Open(t, t, 1L, e.value))
                case None =>
                  open = Some(Open(t, t, 1L, e.value))
              }
            }
            // The before-session was > gap before the open session when
            // its members arrived, but a later in-batch event can have
            // LOWERED the open session's start to within a gap of it
            // (e.g. gap 15: state open at 120, batch carries 104 then
            // 105 — 104 goes to openBefore, 105 merges and drops start
            // to 105, and the batch semantics demand ONE session
            // 104..120). Merge in that case; otherwise it is final.
            (openBefore, open) match {
              case (Some(b), Some(s)) if s.start - b.end <= gapMs =>
                open = Some(Open(
                  math.min(b.start, s.start), math.max(b.end, s.end),
                  s.n + b.n, s.sum + b.sum))
              case (Some(b), _) => out += close(uid, b)
              case _ => ()
            }
            if (emitOpen) {
              open.foreach(s => out += close(uid, s))
              if (state.exists) state.remove()
            } else {
              open.foreach { s =>
                state.update(s)
                // An event AT end + gap still merges (<=), so time out
                // strictly past it. Also never set a timeout at-or-before
                // the current watermark (Spark rejects it); such a
                // session is emitted on the next batch's timeout sweep
                // anyway.
                state.setTimeoutTimestamp(
                  math.max(s.end + gapMs + 1L,
                    state.getCurrentWatermarkMs() + 1L))
              }
            }
            out.result().iterator
          }
      }
  }

  /** Untyped convenience: project a DataFrame with (user_id, ts, value)
    * columns into the typed stream and run [[sessions]]. */
  def sessionStats(
      events: DataFrame, gapMinutes: Int = 30,
      emitOpen: Boolean = true): DataFrame = {
    import events.sparkSession.implicits._
    // NTZ event time → instant (identity under the UTC session) so the
    // Ev encoder's java.sql.Timestamp field resolves for both fixture
    // generations.
    sessions(
      EventWindows.instantTs(events, "ts")
        .selectExpr("user_id", "ts", "value").as[Ev],
      gapMinutes, emitOpen).toDF()
  }
}
