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

  /** Per-user event counts via explicit keyed state. */
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
}
