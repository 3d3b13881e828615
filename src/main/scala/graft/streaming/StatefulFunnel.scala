package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state first-touch funnel via `flatMapGroupsWithState` — the
  * streaming analog of [[EventWindows.funnel]]'s join formulation
  * (the [[StatefulSessions]] precedent applied to funnels).
  *
  * Why custom state: the batch funnel joins each step against the
  * user's anchored window, but a stream cannot re-join history; each
  * user key instead buffers the step events that could still matter
  * and finalizes once the event-time watermark proves the answer
  * can no longer change.
  *
  * Exactness argument (why streaming output = batch output for
  * on-time data):
  *   - the anchor `t1` is the MIN step-1 time, so it only ever
  *     DECREASES as events arrive; the window end `t1 + within` only
  *     ever decreases with it;
  *   - an event with `ts > t1 + within` under the CURRENT t1 can
  *     never join any future chain (future windows are subsets), so
  *     pruning it on arrival is safe and keeps state bounded by the
  *     window horizon — the same bound stream-stream interval joins
  *     hold;
  *   - once the watermark passes `t1 + within`, no arriving event can
  *     lower t1 (its ts exceeds t1) or land inside the window, so the
  *     greedy chain is final — compute it once from the buffered
  *     times and emit.
  *
  * Scale: state per user = step events within ONE window horizon
  * (pruned on every batch), one shuffle (the groupByKey), timeout
  * sweeps emit finals. The typed fold exits whole-stage codegen —
  * inherent to arbitrary-state operators; use the batch join form
  * for batch. */
// Serializable because the flatMapGroupsWithState closure calls
// [[chain]] through the module reference (unlike StatefulSessions,
// whose fold only captures local defs).
object StatefulFunnel extends Serializable {

  /** Input: one step event (step = 0-based index into the funnel's
    * step sequence; filter and map event types upstream). */
  case class FEv(user_id: Long, ts: Timestamp, step: Int)

  /** Buffered per-user candidate times (epoch ms), one seq per step. */
  case class FState(times: Seq[Seq[Long]])

  /** One finalized funnel row: how deep the user got, the anchor, and
    * the deepest reached step's time (epoch ms). */
  case class FunnelRow(user_id: Long, steps_reached: Int, t1_ms: Long,
      t_last_ms: Long)

  /** The greedy first-touch chain over sorted candidate times — the
    * exact semantics of [[EventWindows.funnel]]: anchor at min step-1
    * time, each later step the earliest candidate strictly after the
    * previous step and within the anchored window. */
  private[graft] def chain(times: Seq[Seq[Long]],
      withinMs: Long): Option[(Int, Long, Long)] = {
    if (times.head.isEmpty) return None
    val t1 = times.head.min
    var cur = t1
    var reached = 1
    var k = 1
    while (k < times.length) {
      val next = times(k).filter(t => t > cur && t <= t1 + withinMs)
      if (next.isEmpty) k = times.length
      else {
        cur = next.min
        reached += 1
        k += 1
      }
    }
    Some((reached, t1, cur))
  }

  /** Fold step events into finalized funnel rows. `emitOpen = true`
    * is batch mode: end-of-data finalizes every user, equal to the
    * join formulation. `emitOpen = false` is streaming: users emit on
    * the event-time timeout once the watermark passes `t1 + within`
    * (input must carry `withWatermark("ts", ...)`). */
  def funnels(events: Dataset[FEv], nSteps: Int, withinSeconds: Long,
      emitOpen: Boolean): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    require(nSteps >= 2, s"a funnel needs >= 2 steps, got $nSteps")
    require(withinSeconds > 0, "withinSeconds must be positive")
    val wMs = withinSeconds * 1000L

    def finalize(uid: Long, s: FState): Iterator[FunnelRow] =
      chain(s.times, wMs).map { case (r, t1, tl) =>
        FunnelRow(uid, r, t1, tl)
      }.iterator

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[FEv], state: GroupState[FState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            finalize(uid, s)
          } else {
            val prev = state.getOption
              .getOrElse(FState(Seq.fill(nSteps)(Seq.empty[Long])))
            val buf = Array.tabulate(nSteps)(k => prev.times(k).toBuffer)
            it.foreach { e =>
              if (e.step >= 0 && e.step < nSteps)
                buf(e.step) += e.ts.getTime
            }
            // prune with the CURRENT anchor: future anchors only
            // shrink the window, so ts > t1 + within can never matter
            val t1Opt = if (buf(0).isEmpty) None else Some(buf(0).min)
            val wm = if (emitOpen) 0L else state.getCurrentWatermarkMs()
            val pruned = t1Opt match {
              case Some(t1) => buf.map(_.filter(_ <= t1 + wMs).toSeq).toSeq
              case None if emitOpen => buf.map(_.toSeq).toSeq
              case None =>
                // No anchor yet: a future step-1 event (the only thing
                // that could make these candidates matter) arrives with
                // ts >= wm - slack, and the chain needs candidate
                // ts > t1 >= wm - within, so candidates at or below
                // wm - within are dead — drop them now so anchorless
                // keys cannot grow without bound.
                buf.map(_.filter(_ > wm - wMs).toSeq).toSeq
            }
            val s = FState(pruned)
            if (emitOpen) {
              if (state.exists) state.remove()
              finalize(uid, s)
            } else {
              // nothing buffered and no anchor: hold nothing
              if (pruned.forall(_.isEmpty)) {
                if (state.exists) state.remove()
                Iterator.empty
              } else {
                state.update(s)
                // Anchored keys finalize once the watermark clears the
                // window; anchorless keys sweep once their newest
                // candidate ages past the prune horizon (finalize emits
                // nothing when step 1 is empty), so no key lives forever.
                val timeoutAt = t1Opt match {
                  case Some(t1) => t1 + wMs + 1L
                  case None => pruned.iterator.flatten.max + wMs + 1L
                }
                state.setTimeoutTimestamp(math.max(timeoutAt, wm + 1L))
                Iterator.empty
              }
            }
          }
      }
  }

  /** Untyped convenience mirroring [[EventWindows.funnel]]'s
    * signature: map `steps` to indexes, filter non-step events, run
    * the fold. Only users with a step-1 event emit (the same
    * population the join formulation anchors). */
  def funnelStats(events: DataFrame, steps: Seq[String],
      withinSeconds: Long, emitOpen: Boolean = true): DataFrame = {
    import events.sparkSession.implicits._
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    // Column-based step index (not string-interpolated SQL): step names
    // containing quotes must not break parsing or inject expressions.
    val stepCol = steps.zipWithIndex
      .foldLeft(when(lit(false), lit(-1))) { case (acc, (s, i)) =>
        acc.when(col("event_type") === lit(s), lit(i))
      }
      .otherwise(lit(-1))
    val typed = EventWindows.instantTs(events, "ts")
      .where(col("event_type").isin(steps.map(lit): _*))
      .select(col("user_id"), col("ts"), stepCol.as("step"))
      .as[FEv]
    funnels(typed, steps.size, withinSeconds, emitOpen).toDF()
  }
}
