package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-sessionization with custom state
  * (KeyValueGroupedDataset.flatMapGroupsWithState) — the stateful twin of
  * [[graft.ops.Sessions.sessionize]].
  *
  * State per user is one open session (constant size); closed sessions are
  * emitted as soon as a gap larger than `gapMicros` is observed. This local
  * harness uses NoTimeout (MemoryStream batches, bounded users); a
  * production deployment adds `withWatermark` upstream and
  * GroupStateTimeout.EventTimeTimeout so idle users' state is evicted and
  * their final session flushed — without it, state grows with |users ever
  * seen|.
  */
object SessionStream {

  case class Event(user_id: Long, event_id: Long, ts_us: Long, value: Double)
  case class OpenSession(start_us: Long, end_us: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, total_value: Double)

  /** Fold a user's new events (sorted by ts) into the open session, emitting
    * every session closed by a gap. Events arriving within one batch are
    * sorted here; cross-batch ordering relies on the upstream watermark.
    */
  def updateUser(gapMicros: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us - s.end_us <= gapMicros =>
          // max() so a late (out-of-order) cross-batch event can extend the
          // session's stats without moving its end backwards
          open = Some(OpenSession(math.min(s.start_us, e.ts_us),
            math.max(s.end_us, e.ts_us), s.n + 1, s.total + e.value))
        case Some(s) =>
          closed += SessionOut(userId, s.start_us, s.end_us, s.n, s.total)
          open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Wire the stateful sessionizer over a (possibly streaming) event
    * Dataset. Works identically on batch Datasets for testing.
    */
  def sessionize(events: Dataset[Event], gapMicros: Long): Dataset[SessionOut] =
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateUser(gapMicros))(
        Encoders.product[OpenSession], Encoders.product[SessionOut])

  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** [[runningTotals]] on the Spark 4 arbitrary-state API
    * (`transformWithState` + a [[StatefulProcessor]] with typed
    * `ValueState`): the successor to mapGroupsWithState — explicit named
    * state variables, per-state TTL, timers, and schema evolution of state.
    * Requires the RocksDB state store provider. Semantics here are
    * identical to [[runningTotals]] so the spec cross-checks the two APIs.
    */
  def runningTotalsTws(events: Dataset[Event]): Dataset[UserTotals] =
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new RunningTotalsProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())(Encoders.product[UserTotals])

  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotals] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var totals: ValueState[UserTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals](
        "totals", Encoders.product[UserTotals], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserTotals] = {
      val prev = if (totals.exists()) totals.get() else UserTotals(userId, 0L, 0.0)
      val next = rows.foldLeft(prev)((acc, e) =>
        UserTotals(userId, acc.n_events + 1, acc.total_value + e.value))
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** Running per-user totals via mapGroupsWithState (the one-output-per-key
    * stateful API, Update output mode): each micro-batch emits the user's
    * cumulative count/total so far. State is one counter pair per user.
    */
  def runningTotals(events: Dataset[Event]): Dataset[UserTotals] =
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0))
          val next = batch.foldLeft(prev)((acc, e) =>
            UserTotals(userId, acc.n_events + 1, acc.total_value + e.value))
          state.update(next)
          next
      }(Encoders.product[UserTotals], Encoders.product[UserTotals])
}
