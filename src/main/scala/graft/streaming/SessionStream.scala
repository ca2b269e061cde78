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

  /** Fold a user's new events into the open session as a SORTED INTERVAL
    * MERGE, emitting every session closed by a gap: the batch's events
    * (unit intervals) and the open session are ordered by start and merged
    * where the gap between consecutive intervals is within `gapMicros`.
    *
    * The interval form matters for late data (review r9): the previous
    * event-at-a-time fold compared only against the open session's END, so
    * `e.ts - end <= gap` was vacuously true for ANY event in the past — a
    * late event a week before the session merged into it instead of
    * opening its own earlier session. Here a late event more than a gap
    * before the open session's start forms (and closes) its own session,
    * matching the batch twin whenever the late events arrive within one
    * lifetime of the open state. Residual limit of one-open-session state:
    * an already-EMITTED session can never retroactively absorb later
    * arrivals — the upstream watermark bounds how late those can be.
    */
  def updateUser(gapMicros: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val evIvs = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
      .map(e => OpenSession(e.ts_us, e.ts_us, 1L, e.value))
    val all = state.getOption match {
      case Some(s) =>
        val (before, after) = evIvs.partition(_.start_us < s.start_us)
        before ++ (s +: after)
      case None => evIvs
    }
    if (all.isEmpty) return Iterator.empty
    val closed = Seq.newBuilder[SessionOut]
    var cur = all.head
    all.tail.foreach { iv =>
      if (iv.start_us - cur.end_us <= gapMicros)
        cur = OpenSession(math.min(cur.start_us, iv.start_us),
          math.max(cur.end_us, iv.end_us), cur.n + iv.n, cur.total + iv.total)
      else {
        closed += SessionOut(userId, cur.start_us, cur.end_us, cur.n, cur.total)
        cur = iv
      }
    }
    state.update(cur)
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
