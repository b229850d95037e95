package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators (SURVEY.md §2.9's open slot:
  * `flatMapGroupsWithState` for state the built-in aggregations can't
  * express). */
object StatefulOps {

  case class Keyed(user_id: Long, event_type: String, event_id: Long, ts_us: Long)

  /** Streaming first-seen dedup: per (user, event_type) emit exactly the
    * first event ever observed and drop every later one — the streaming
    * analog of exact dedup, with per-key state that outlives micro-batch
    * boundaries. Within a batch "first" is the (ts, id)-minimum so output
    * is deterministic regardless of partition order. */
  def firstSeen(ds: Dataset[Keyed]): Dataset[Keyed] = {
    implicit val keyEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val outEnc = Encoders.product[Keyed]
    implicit val stateEnc = Encoders.scalaBoolean
    ds.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Long, String), events: Iterator[Keyed], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(events.minBy(e => (e.ts_us, e.event_id)))
          }
        })
  }
}
