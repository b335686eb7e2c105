package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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
}
