package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{
  ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** The two remaining `transformWithState` state-handle surfaces the 100 TB
  * deployment would use (completing ValueState+timers in [[TwsSessions]]
  * and MapState+bootstrap in [[TwsCounts]]):
  *
  *  - **ListState last-N** ([[LastNProcessor]]): the recent-activity
  *    window every feature store keeps per user. Why ListState and not
  *    ValueState[Seq]: `appendValue` is a RocksDB APPEND — a batch that
  *    adds 3 events to a 10k-event key writes 3 entries, it does NOT
  *    read-modify-rewrite the whole list. The N-trim (which DOES rewrite
  *    via `put`) runs AMORTIZED: only when the stored list has grown past
  *    `trimSlack`x the window, so steady-state per-batch I/O is O(events
  *    arrived), not O(window) — the append-vs-rewrite distinction at
  *    100 TB fan-in.
  *  - **TTLConfig eviction** ([[TtlCountProcessor]]): state that expires
  *    by PROCESSING TIME without timer bookkeeping — the per-key visit
  *    counter that must forget idle keys so unbounded key churn cannot
  *    grow state forever (the real reason TTL exists at scale: crawl
  *    frontiers and sessionless user IDs arrive once and never return).
  *    Expired state reads as absent on the next access; the counter
  *    restarts rather than resuming.
  *
  * Both require the RocksDB state-store provider (wrap queries in
  * `StateBackend.using`). TwsRecentSpec proves the last-N window equals
  * the batch tail-N on scripted input (including the amortized-trim
  * path), and that a short TTL really evicts while a long TTL really
  * retains across the same wall-clock gap.
  */
object TwsRecent {

  /** One output row per (user, batch): the current last-N window. */
  case class LastNOut(userId: Long, n: Int, recent: String)

  /** Last-N events per key on ListState. `n` is the window; the stored
    * list is allowed to grow to `trimSlack * n` before a trimming
    * rewrite (the amortization knob).
    */
  class LastNProcessor(n: Int, trimSlack: Int = 4)
      extends StatefulProcessor[Long, (Long, Long, String), LastNOut] {
    require(n >= 1 && trimSlack >= 2)

    @transient private var recent: ListState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[String](
        "recent", Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[(Long, Long, String)],
        timers: TimerValues): Iterator[LastNOut] = {
      // arrival order within a batch is the seq order (scripted inputs
      // carry an explicit seq so the contract is deterministic)
      val batch = rows.toSeq.sortBy(_._2).map(_._3)
      // APPEND-ONLY hot path: no read of the existing list
      batch.foreach(recent.appendValue)
      // read back for the emission; trim only when well past the window
      val stored = recent.get().toArray
      val window = stored.takeRight(n)
      if (stored.length > trimSlack * n) recent.put(window)
      Iterator.single(LastNOut(user, window.length, window.mkString(",")))
    }
  }

  /** The last-N stream: Update-mode emissions of each touched user's
    * current window, oldest-to-newest, comma-joined. Input columns:
    * (user_id, seq, item). RocksDB provider required at query start.
    */
  def lastNTws(spark: SparkSession, events: DataFrame, n: Int,
      trimSlack: Int = 4): DataFrame = {
    import spark.implicits._
    events
      .select($"user_id", $"seq", $"item")
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState[LastNOut](
        new LastNProcessor(n, trimSlack), TimeMode.None, OutputMode.Update)
      .toDF()
  }

  /** One output row per (user, batch): events counted since the state
    * was last alive (a TTL eviction restarts the count).
    */
  case class TtlCountOut(userId: Long, n: Long)

  /** Per-key event counter whose state expires after `ttl` of
    * processing-time inactivity — TTLConfig does the eviction, no
    * timers. An expired key's next batch sees absent state and restarts
    * from zero + the batch's own rows.
    */
  class TtlCountProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, (Long, String), TtlCountOut] {

    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long](
        "count", Encoders.scalaLong, TTLConfig(ttl))

    override def handleInputRows(
        user: Long, rows: Iterator[(Long, String)],
        timers: TimerValues): Iterator[TtlCountOut] = {
      val add = rows.size.toLong
      // an expired entry reads as absent — exactly the restart we want
      val base = if (count.exists()) count.get() else 0L
      val nv = base + add
      count.update(nv)
      Iterator.single(TtlCountOut(user, nv))
    }
  }

  /** The TTL-evicted counter stream. Input columns:
    * (user_id, event_type). RocksDB provider required at query start.
    */
  def ttlCountsTws(spark: SparkSession, events: DataFrame,
      ttl: java.time.Duration): DataFrame = {
    import spark.implicits._
    events
      .select($"user_id", $"event_type")
      .as[(Long, String)]
      .groupByKey(_._1)
      // TTL is a processing-time feature: the runtime stamps each write
      // with the batch timestamp, so the query must run in
      // TimeMode.ProcessingTime (TimeMode.None rejects TTL state)
      .transformWithState[TtlCountOut](
        new TtlCountProcessor(ttl), TimeMode.ProcessingTime, OutputMode.Update)
      .toDF()
  }
}
