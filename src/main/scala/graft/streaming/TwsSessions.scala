package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

import EventStream.{SessionState, SessionOut}

/** Closed-session sessionization on Spark 4's `transformWithState` — the
  * arbitrary-state API that supersedes (flat)mapGroupsWithState for new
  * code. Semantics are IDENTICAL to [[EventStream.closedSessionsStream]]
  * (same gap rule, same out-of-order guard, same event-time idle close);
  * TwsSessionsSpec asserts the two produce the same rows on the same
  * input, so the migration is provably behavior-preserving.
  *
  * What the new API changes at 100 TB scale, and how this operator uses it:
  *
  *  - **Typed state handles instead of one opaque blob**: the session
  *    accumulator lives in a named `ValueState[SessionState]` obtained in
  *    `init`. A processor can hold several independent handles (value /
  *    list / map), each a separate column family in RocksDB — reads fetch
  *    only the state they touch instead of deserializing one monolith.
  *  - **Explicit timers instead of one timeout slot**: `registerTimer`
  *    arms an event-time timer at `session end + gap`; when a new event
  *    extends the session the now-stale timer is `deleteTimer`'d and a new
  *    one armed. (mapGroupsWithState's single `setTimeoutTimestamp` slot
  *    made that implicit; here it is visible and auditable.)
  *    `handleExpiredTimer` double-checks the firing timer is the CURRENT
  *    session's close time, so a stale timer that escaped deletion (e.g.
  *    replayed from a checkpoint written mid-update) can never emit a
  *    session early.
  *  - **RocksDB required**: transformWithState only runs on the RocksDB
  *    state-store provider (the multi-column-family layout needs it), so
  *    callers wrap query start in
  *    `StateBackend.using(spark, StateBackend.RocksDb)` — the disk-backed
  *    provider the 100 TB deployment runs anyway (see StateBackend).
  *
  * State size is governed by the watermark exactly as before: one
  * `SessionState` (24 bytes) per OPEN session, removed on close, with the
  * timer guaranteeing every idle session eventually closes and frees its
  * key.
  */
object TwsSessions {

  /** Event-time sessionizer processor. Input rows are (user, ts_us); the
    * third input column (the watermarked timestamp) rides along only so
    * the analyzer keeps the watermark through groupByKey.
    */
  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, (Long, Long, java.sql.Timestamp), SessionOut] {

    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    /** Event-time ms at which an open session idle-closes — the timer key.
      * One derivation shared by arm/delete/fire so they can never skew.
      */
    private def closeAtMs(st: SessionState): Long = (st.end + gapUs) / 1000

    override def handleInputRows(
        user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
        timers: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.map(_._2).toSeq.sorted
      val closed = Seq.newBuilder[SessionOut]
      var st = if (session.exists()) session.get() else null
      val prevTimer = if (st != null) closeAtMs(st) else -1L
      sorted.foreach { t =>
        st =
          if (st == null) SessionState(t, t, 1)
          else if (t - st.end > gapUs) {
            closed += SessionOut(user, st.start, st.end, st.n)
            SessionState(t, t, 1)
          } else st.copy(end = math.max(st.end, t), n = st.n + 1)
      }
      if (st != null) {
        session.update(st)
        val newTimer = closeAtMs(st)
        if (newTimer != prevTimer) {
          if (prevTimer >= 0) getHandle.deleteTimer(prevTimer)
          getHandle.registerTimer(newTimer)
        }
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(
        user: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!session.exists()) return Iterator.empty
      val st = session.get()
      // Stale-timer guard: only the timer armed for the CURRENT session
      // end may close it. An older timer (deleted-but-replayed) fires with
      // a smaller expiry and is ignored; the current one is still armed.
      if (expired.getExpiryTimeInMs < closeAtMs(st)) return Iterator.empty
      session.clear()
      Iterator(SessionOut(user, st.start, st.end, st.n))
    }
  }

  /** transformWithState twin of [[EventStream.closedSessionsStream]]:
    * emits each session exactly once, the moment a larger gap arrives or
    * the watermark passes its idle-close time. Requires the RocksDB
    * state-store provider at query START (wrap in `StateBackend.using`).
    */
  def closedSessionsTws(
      spark: SparkSession, events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours"): DataFrame = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000 * 1000
    events
      .withColumn("event_time", Sessions.nsToTimestamp(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .withColumn("ts_us", Sessions.nsToUs(col("ts")))
      .select($"user_id", $"ts_us", $"event_time")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState[SessionOut](
        new SessionProcessor(gapUs), TimeMode.EventTime, OutputMode.Append)
      .toDF()
  }
}
