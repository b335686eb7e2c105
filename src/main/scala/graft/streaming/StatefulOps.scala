package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** Arbitrary stateful processing (`mapGroupsWithState`) — the escape
  * hatch the built-in windows can't cover (SURVEY.md §2.2: custom state).
  * Kept deliberately small: per-user running totals with explicit state,
  * the shape a fraud/quality scorer with custom eviction rules would
  * take. Runs on batch Datasets too (one group pass), which is what the
  * equivalence test exploits. */
object StatefulOps {

  case class UserAgg(user_id: Long, cnt: Long)

  /** Per-user event counts via explicit keyed state. Unbounded retention —
    * only for finite replays / tests; the 100 TB shape is
    * [[userCountsTtl]], which evicts idle keys. */
  def userCounts(events: DataFrame): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events.selectExpr("user_id").as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + rows.size
          state.update(c)
          UserAgg(uid, c)
      }
  }

  /** Open sessions per user: (startMicros, lastMicros, cnt) triples. */
  case class SessionAcc(sessions: List[(Long, Long, Long)])

  /** Finalized session in q09's output shape (epoch-second BIGINTs). */
  case class SessionRow(user_id: Long, s_start: Long, s_end: Long, cnt: Long)

  /** Custom sessionizer via `flatMapGroupsWithState` + EventTimeTimeout —
    * the explicit-state twin of `session_window`, for session semantics
    * the built-in can't express (per-session custom payloads, dynamic
    * gaps, early emission). Semantics match Spark's exactly: an event at
    * t joins an open session iff t < last + gap (micros-precise), the
    * session ends at last + gap, and a session finalizes — is emitted
    * once and its state evicted — when the event-time watermark passes
    * its end. StreamEquivSpec proves the replayed stream equals the
    * `session_window` batch aggregate row-for-row.
    *
    * State is bounded the same way the built-in is: only open sessions
    * (within the watermark horizon) live in the store, keyed by user —
    * at 100 TB the store holds ~horizon × arrival-rate entries, not
    * history. Streaming-only by design: the emit-on-watermark contract
    * has no batch analog (the batch twin IS `session_window`). */
  def sessionize(events: DataFrame, gapSec: Long = 600): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    val gapUs = gapSec * 1000000L
    // the watermarked `ts` attribute must reach flatMapGroupsWithState
    // AS A COLUMN: any expression over it (unix_micros) or typed .map
    // (SerializeFromObject) mints fresh attributes without the event-time
    // watermark metadata, and the analyzer rejects EventTimeTimeout when
    // no child output attribute carries it — so ts rides along untouched
    // and the micros conversion happens inside the state function
    // floorDiv, not /: getTime truncates toward zero, so a pre-1970
    // fractional second would otherwise land on the wrong microsecond
    // (unix_micros semantics = floor)
    def micros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .select(col("user_id").as[Long], col("ts").as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, SessionRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rs: Iterator[(Long, java.sql.Timestamp)], state: GroupState[SessionAcc]) =>
          val rows = rs.map(r => (r._1, micros(r._2)))
          val wmMs = state.getCurrentWatermarkMs()
          // CEILING division: the watermark is millis-precise but the
          // session end (last + gap) is micros-precise — flooring would
          // let a timer emit a session whose true end the watermark has
          // not actually passed (a non-late event in the same millisecond
          // could still join it). Whole-second fixtures mask the
          // difference; sub-millisecond event times do not.
          def endMs(s: (Long, Long, Long)): Long = (s._2 + gapUs + 999L) / 1000L
          if (state.hasTimedOut) {
            // watermark passed: emit every session whose end it crossed
            val (closed, open) = state.get.sessions.partition(endMs(_) <= wmMs)
            if (open.isEmpty) state.remove()
            else {
              state.update(SessionAcc(open))
              state.setTimeoutTimestamp(math.max(open.map(endMs).min, wmMs + 1))
            }
            closed.sortBy(_._1).iterator.map { case (s, l, c) =>
              SessionRow(uid, s / 1000000L, l / 1000000L + gapSec, c)
            }
          } else {
            // merge new points into open sessions (t joins iff t < last+gap)
            val pts = rows.map(_._2).toList.map(t => (t, t, 1L))
            val all = (state.getOption.map(_.sessions).getOrElse(Nil) ++ pts)
              .sortBy(s => (s._1, s._2))
            val merged = all.foldLeft(List.empty[(Long, Long, Long)]) {
              case (cur :: done, s) if s._1 < cur._2 + gapUs =>
                (cur._1, math.max(cur._2, s._2), cur._3 + s._3) :: done
              case (acc, s) => s :: acc
            }.reverse
            state.update(SessionAcc(merged))
            state.setTimeoutTimestamp(math.max(merged.map(endMs).min, wmMs + 1))
            Iterator.empty
          }
      }
  }

  /** x21: [[sessionize]] as a registered gate — the one §2.2-named API
    * (`flatMapGroupsWithState`) whose semantics were spec-proven but
    * never oracle-gated. Runs the explicit-state sessionizer through the
    * SAME watermarked append replay as q09's built-in `session_window`
    * path and must land on the SAME oracle string verbatim (the
    * d19/x20/m15 shared-string convention): two independent session
    * implementations — Spark's incremental merge-on-watermark state
    * store vs this hand-rolled EventTimeTimeout sessionizer — pinned to
    * one closed-form gaps-and-islands SQL, so a drift in either's merge
    * rule, end = last + gap arithmetic, or emit-once contract lands on
    * different rows. */
  def x21FmgwsSessions(spark: SparkSession, dir: String): DataFrame =
    Replay.appendFlushed(spark, dir, "events", Some(8))(df =>
      sessionize(df.withWatermark("ts", "10 minutes")).toDF())
      .orderBy("user_id", "s_start")

  /** x22: the sessionizer on Spark 4's `transformWithState` — the MODERN
    * arbitrary-state API ([[StatefulProcessor]] + typed state variables +
    * explicit event-time timers; requires the RocksDB provider the engine
    * already runs on). Third independent implementation of one session
    * semantics, pinned to q09's oracle SQL verbatim alongside the
    * built-in `session_window` (q09) and the legacy
    * `flatMapGroupsWithState` (x21): an event at t joins an open session
    * iff t < last + gap (micros-precise), the session ends at last + gap,
    * and a session finalizes when the event-time watermark passes its end
    * — here driven by REGISTERED TIMERS (one per key at the earliest open
    * end) instead of x21's per-key timeout timestamp, which is exactly
    * the API delta the gate documents: timers are a set, so a processor
    * can track many independent deadlines per key where the legacy API
    * carries one. State is bounded identically: only open sessions within
    * the watermark horizon live in the store. */
  def x22TwsSessions(spark: SparkSession, dir: String): DataFrame =
    Replay.appendFlushed(spark, dir, "events", Some(8))(df =>
      twsSessionize(df.withWatermark("ts", "10 minutes")).toDF())
      .orderBy("user_id", "s_start")

  /** [[sessionize]]'s merge rule on the transformWithState API: merge
    * arriving points into open sessions on input, emit-and-evict on
    * timer expiry. Streaming-only by design, like [[sessionize]]. */
  def twsSessionize(events: DataFrame, gapSec: Long = 600): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").as[Long], col("ts").as[java.sql.Timestamp])
      .groupByKey(_._1)
      .transformWithState(new TwsSessionizer(gapSec),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The [[StatefulProcessor]] behind [[twsSessionize]]. Sessions are a
    * [[ValueState]] of open (startMicros, lastMicros, cnt) triples; each
    * input batch merges its points (the t < last + gap rule, identical
    * arithmetic to [[sessionize]]) and registers an event-time timer at
    * the earliest open end; an expired timer emits every session whose
    * end the watermark crossed, then re-arms for the remainder or clears
    * the state. Duplicate timer registrations are harmless — a firing
    * with nothing ripe emits nothing — so no timer bookkeeping state is
    * carried. */
  private class TwsSessionizer(gapSec: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp), SessionRow] {
    private val gapUs = gapSec * 1000000L
    @transient private var open: ValueState[SessionAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionAcc]("open",
        Encoders.product[SessionAcc], TTLConfig.NONE)

    // micros conversion identical to sessionize's (floorDiv: getTime
    // truncates toward zero, so a pre-1970 fractional second would
    // otherwise land on the wrong microsecond)
    private def micros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

    // ceiling division, same rationale as sessionize's endMs: emission
    // must never precede the micros-precise session end
    private def endMs(s: (Long, Long, Long)): Long = (s._2 + gapUs + 999L) / 1000L

    override def handleInputRows(uid: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[SessionRow] = {
      val pts = rows.map(r => micros(r._2)).toList.map(t => (t, t, 1L))
      val existing = if (open.exists()) open.get().sessions else Nil
      val all = (existing ++ pts).sortBy(s => (s._1, s._2))
      val merged = all.foldLeft(List.empty[(Long, Long, Long)]) {
        case (cur :: done, s) if s._1 < cur._2 + gapUs =>
          (cur._1, math.max(cur._2, s._2), cur._3 + s._3) :: done
        case (acc, s) => s :: acc
      }.reverse
      open.update(SessionAcc(merged))
      // merged can only be empty if the API ever invoked us with no input
      // rows and no existing state — guard locally rather than lean on
      // that contract (min on an empty list throws)
      if (merged.nonEmpty)
        getHandle.registerTimer(
          math.max(merged.map(endMs).min, timerValues.getCurrentWatermarkInMs() + 1))
      Iterator.empty
    }

    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionRow] = {
      if (!open.exists()) return Iterator.empty
      val wmMs = timerValues.getCurrentWatermarkInMs()
      val (closed, still) = open.get().sessions.partition(endMs(_) <= wmMs)
      if (still.isEmpty) open.clear()
      else {
        open.update(SessionAcc(still))
        getHandle.registerTimer(math.max(still.map(endMs).min, wmMs + 1))
      }
      closed.sortBy(_._1).iterator.map { case (s, l, c) =>
        SessionRow(uid, s / 1000000L, l / 1000000L + gapSec, c)
      }
    }
  }

  /** [[userCounts]] with a state TTL: a key idle for `ttlMs` of processing
    * time is evicted (state removed, a zero-count tombstone emitted), and
    * a later arrival of the same key re-counts from zero. Unbounded keyed
    * state is the one thing a continuous pipeline cannot carry — at
    * 100 TB the key space (user ids) only grows, so every stateful
    * operator needs an eviction policy; this is the explicit-state analog
    * of a watermark.
    *
    * In batch mode timeouts never fire (single pass, no clock), so the
    * batch≡stream equivalence of the *counting* logic still holds.
    *
    * Operational note: a query over this operator keeps scheduling
    * micro-batches even with no new data — that is how idle keys' timers
    * get a chance to fire — so it never reports "caught up"
    * (`processAllAvailable` would block forever). Run it with a real
    * `Trigger.ProcessingTime` interval, which is the continuous-pipeline
    * deployment shape anyway. */
  def userCountsTtl(events: DataFrame, ttlMs: Long): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events.selectExpr("user_id").as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            UserAgg(uid, 0L)
          } else {
            val c = state.getOption.getOrElse(0L) + rows.size
            state.update(c)
            state.setTimeoutDuration(ttlMs)
            UserAgg(uid, c)
          }
      }
  }

  /** [[userCountsTtl]] on `transformWithState` — the second production
    * stateful operator ported to the modern API (x22's sessionizer is
    * the first), pinning the mechanical migration recipe the x22
    * scaladoc promises: `setTimeoutDuration(ttl)` re-armed on every
    * input becomes a [[TTLConfig]] on the state VARIABLE — eviction
    * moves from hand-rolled timeout handling into the store itself, so
    * the processor body shrinks to the pure counting logic. The one
    * behavioral delta, stated rather than hidden: TTL eviction is
    * SILENT (an expired value simply reads as absent and the next
    * arrival re-counts from zero), where the legacy operator's timeout
    * callback emits a zero-count tombstone — a consumer needing
    * tombstones keeps the timer form (register an event/processing-time
    * timer per key, x22's shape); one needing only bounded state takes
    * this form and saves the timer bookkeeping. The legacy operational
    * note carries over verbatim: a TTL-stateful query keeps scheduling
    * micro-batches for time maintenance and never reports caught up —
    * run it under a real `Trigger.ProcessingTime` (an AvailableNow
    * drain spins forever). ContinuousSpec proves multi-batch counting,
    * cross-batch state carry, and the silent eviction under that
    * deployment shape. */
  def twsUserCountsTtl(events: DataFrame, ttlMs: Long): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events.selectExpr("user_id").as[Long]
      .groupByKey(identity)
      .transformWithState(new TwsTtlCounter(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** The [[StatefulProcessor]] behind [[twsUserCountsTtl]]: one
    * TTL-configured [[ValueState]] holding the running count; every
    * read past the TTL horizon sees an absent value by store contract,
    * so eviction needs no code here at all. */
  private class TwsTtlCounter(ttlMs: Long)
      extends StatefulProcessor[Long, Long, UserAgg] {
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(uid: Long, rows: Iterator[Long],
        timerValues: TimerValues): Iterator[UserAgg] = {
      val c = (if (cnt.exists()) cnt.get() else 0L) + rows.size
      cnt.update(c)
      Iterator.single(UserAgg(uid, c))
    }
  }
}
