package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming coverage-gap watch — the live twin of
  * [[graft.ops.Coverage.gaps]] (batch oracle q128): per key, alert when a
  * feed falls silent.
  *
  * Two row shapes, both final (Append mode):
  *  - CLOSED gap (`open = false`): the next event arrived ≥ `minGap` after
  *    the previous one — same semantics as the batch operator, so with
  *    in-order per-key delivery the closed rows converge to exactly the
  *    batch answer.
  *  - OPEN gap (`open = true`, gap_end/gap_us = −1): the watermark passed
  *    `last event + minGap` with no new event — an event-time timeout
  *    fires ONCE per silence (re-armed only by the next arrival), which is
  *    the alert a monitoring consumer actually wants: "this source is
  *    quiet NOW", not only after it recovers. If the source later
  *    recovers, the closed row follows — alert, then resolution.
  *
  * Out-of-order guard: a straggler older than the seen maximum never
  * creates a retroactive gap and never moves `last` backwards (max-only
  * advance — the same monotonicity discipline as closedSessionsStream).
  * State per key is 17 bytes and is never removed while the key lives;
  * timeouts bound the alerting latency by the watermark delay.
  */
object GapWatch {

  case class GapState(lastUs: Long, alerted: Boolean)
  case class GapOut(
      userId: Long, gapStartUs: Long, gapEndUs: Long, gapUs: Long, open: Boolean)

  def watch(
      spark: SparkSession,
      events: DataFrame,
      minGapMinutes: Int = 360,
      watermarkDelay: String = "2 hours"): DataFrame = {
    import spark.implicits._
    val gapUs = minGapMinutes.toLong * 60 * 1000000
    events
      .withColumn("event_time", Sessions.nsToTimestamp(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .withColumn("ts_us", Sessions.nsToUs(col("ts")))
      // keep the watermarked column in the grouped Dataset (dropping it
      // before the stateful operator would detach the watermark and fail
      // EventTimeTimeout analysis)
      .select($"user_id", $"ts_us", $"event_time")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[GapState, GapOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[GapState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.update(st.copy(alerted = true)) // one alert per silence
            Iterator(GapOut(user, st.lastUs, -1L, -1L, open = true))
          } else {
            val sorted = rows.map(_._2).toSeq.sorted
            val out = Seq.newBuilder[GapOut]
            var st = state.getOption.orNull
            sorted.foreach { t =>
              if (st == null) st = GapState(t, alerted = false)
              else {
                if (t - st.lastUs >= gapUs)
                  out += GapOut(user, st.lastUs, t, t - st.lastUs, open = false)
                if (t > st.lastUs) st = GapState(t, alerted = false)
              }
            }
            state.update(st)
            if (!st.alerted)
              state.setTimeoutTimestamp(st.lastUs / 1000 + gapUs / 1000) // ms
            out.result().iterator
          }
      }
      .toDF()
  }
}
