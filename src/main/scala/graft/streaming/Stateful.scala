package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom keyed state over a stream (SURVEY §2.9 UDF/state surface;
  * build brief: `KeyValueGroupedDataset.mapGroupsWithState` for custom
  * state). Running per-user totals whose state lives in the streaming
  * checkpoint — totals keep accumulating across micro-batches AND across
  * query restarts, the property the ingest hook's index refresh relies on.
  */
object Stateful {

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n: Long, sum: Double)

  def runningTotals(events: Dataset[UserEvent]): Dataset[UserTotals] =
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(key, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserTotals(key, prev.n + batch.size, prev.sum + batch.map(_.value).sum)
          state.update(next)
          next
      }(Encoders.product[UserTotals], Encoders.product[UserTotals])
}
