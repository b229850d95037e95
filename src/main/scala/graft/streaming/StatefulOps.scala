package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Custom stateful streaming operators (SURVEY.md §2.9's open slot:
  * `flatMapGroupsWithState` for state the built-in aggregations can't
  * express). */
object StatefulOps {

  case class Keyed(user_id: Long, event_type: String, event_id: Long, ts_us: Long)

  case class RunningAgg(user_id: Long, n_events: Long, max_event_id: Long)

  /** Per-key running aggregate on the `transformWithState` API (Spark 4's
    * arbitrary-state successor to flatMapGroupsWithState: typed per-key
    * state handles, TTL support, timers). ValueState carries (count,
    * max-id) across micro-batches; every batch emits the key's updated
    * running totals, so the LAST update per key equals the batch
    * aggregate — the oracle-able contract. Integer-only arithmetic keeps
    * the result engine-exact regardless of row order. */
  private class RunningAggProcessor
    extends StatefulProcessor[Long, Keyed, RunningAgg] {
    @transient private var state: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("agg",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Keyed],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[RunningAgg] = {
      var (n, mx) = if (state.exists()) state.get() else (0L, Long.MinValue)
      rows.foreach { r => n += 1; mx = math.max(mx, r.event_id) }
      state.update((n, mx))
      Iterator.single(RunningAgg(key, n, mx))
    }
  }

  /** Running per-user (event count, max event id) updates — one row per
    * (user, micro-batch) with the state-so-far. */
  def runningAgg(ds: Dataset[Keyed]): Dataset[RunningAgg] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[RunningAgg] = Encoders.product[RunningAgg]
    ds.groupByKey(_.user_id)
      .transformWithState(new RunningAggProcessor,
        TimeMode.None(), OutputMode.Update(), outEnc)
  }

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
