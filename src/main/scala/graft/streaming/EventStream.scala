package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.8 idiomatic extension): the
  * incremental twin of Sessions' batch aggregations — `readStream` over the
  * events layout, watermarked tumbling windows, and a
  * mapGroupsWithState-based sessionizer.
  *
  * The batch and streaming forms share the same event-time semantics, so the
  * memory-sink smoke test asserts stream output == batch output on the same
  * files (processAllAvailable drains the source synchronously).
  */
object EventStream {

  /** Events schema as stored (round-5 testdata: ts is timestamp[us]).
    * [[readEvents]] converts ts to the int64-nanoseconds contract every
    * event-time operator shares (see Tables.events).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      // glob (not the bare file) so FileStreamSource's basePath is the
      // directory; in production this is the landing directory itself.
      .parquet(s"$dir/events.parque*")
      .withColumn("ts", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000"))

  /** Watermarked tumbling-window aggregation: count + sum(value) per
    * (1 hour window, event_type). Late events beyond 2 hours are dropped at
    * the state store — bounded state at 100 TB/day rates.
    */
  def hourlyAggStream(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", Sessions.nsToTimestamp(col("ts")))
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Run a streaming aggregation into a named memory sink and drain it. */
  def runToMemory(agg: DataFrame, name: String): StreamingQuery = {
    val q = agg.writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }

  /** Production landing sink: append-mode parquet with a checkpoint — the
    * exactly-once path. Offsets commit to `checkpointDir` and completed
    * files to the sink's `_spark_metadata` log, so a crash/restart resumes
    * from the checkpoint instead of reprocessing (EventStreamSpec proves a
    * restart over a fully-drained checkpoint emits zero duplicate rows).
    * AvailableNow drains what exists and stops — the batch-boundary
    * trigger for backfills; pass ProcessingTime for a live tail.
    */
  def writeToParquet(
      stream: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()

  /** Streaming exact dedup — the incremental twin of Dedup.exact: drop
    * re-deliveries of the same content digest, with the digest store bounded
    * by the watermark (state for a digest expires once the watermark passes
    * its event time — at 100 TB/day the state never grows past one
    * watermark-window of distinct digests).
    */
  /** The digest dedupStream/dedupBatch key on — one definition so the
    * stream and its batch twin can never drift.
    */
  def contentDigest: Column =
    md5(concat_ws("#", col("user_id"), col("event_type"), col("props")))

  def dedupStream(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withColumn("event_time", Sessions.nsToTimestamp(col("ts")))
      .withColumn("content_digest", contentDigest)
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_digest")

  /** Batch twin of [[dedupStream]], made deterministic for the oracle:
    * where the stream keeps the FIRST arrival per digest (arrival order —
    * not reproducible in batch), this keeps min(event_id) and reports the
    * duplicate count. One hash aggregation; the shuffle carries
    * (digest, id, count) only.
    */
  def dedupBatch(events: DataFrame): DataFrame =
    events
      .withColumn("content_digest", contentDigest)
      .groupBy("content_digest")
      .agg(min(col("event_id")).as("keep_event_id"),
        count(lit(1)).as("n_copies"))

  /** Stream-stream interval join (§2.8): every purchase matched to the SAME
    * user's clicks in the preceding `windowMinutes` — the attribution join
    * as two live streams. Both sides are watermarked and the join condition
    * bounds click_time to [purchase_time − window, purchase_time], so Spark
    * derives state-eviction watermarks for BOTH sides: click state drops
    * once the purchase watermark passes its eligibility window, purchase
    * state once the click watermark passes the purchase time. State is
    * bounded by (watermark delay + window) regardless of stream length —
    * the 100 TB/day-safe shape.
    *
    * The plan is pure declarative DataFrame code, so the SAME function runs
    * in batch (watermarks are eliminated by the optimizer there): q55 is
    * the batch twin, EventStreamSpec asserts stream output == batch output
    * on the same files.
    */
  def intervalJoin(
      clicksRaw: DataFrame, purchasesRaw: DataFrame,
      windowMinutes: Int = 30, watermarkDelay: String = "2 hours"): DataFrame = {
    val clicks = clicksRaw
      .filter(col("event_type") === "click")
      .withColumn("click_time", Sessions.nsToTimestamp(col("ts")))
      .withWatermark("click_time", watermarkDelay)
      .select(
        col("user_id"), col("event_id").as("click_id"), col("click_time"))
    val purchases = purchasesRaw
      .filter(col("event_type") === "purchase")
      .withColumn("purchase_time", Sessions.nsToTimestamp(col("ts")))
      .withWatermark("purchase_time", watermarkDelay)
      .select(
        col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("purchase_time"))
    purchases.join(
      clicks,
      col("p_user_id") === col("user_id") &&
        col("click_time") >=
          col("purchase_time") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("click_time") <= col("purchase_time"))
      .select(
        col("purchase_id"), col("p_user_id").as("user_id"),
        col("click_id"), col("purchase_time"), col("click_time"))
  }

  /** LEFT OUTER flavour of [[intervalJoin]]: purchases with NO click in the
    * preceding window are still emitted (click columns null) — attribution
    * including the organic conversions. In streaming, Spark holds an
    * unmatched purchase until the CLICK watermark passes the end of its
    * eligibility window, then emits the null-padded row exactly once —
    * outer results are late by one watermark delay but final. Same
    * declarative plan batch/stream; q138's batch twin oracle-checks the
    * null-padding semantics.
    */
  def intervalJoinOuter(
      clicksRaw: DataFrame, purchasesRaw: DataFrame,
      windowMinutes: Int = 30, watermarkDelay: String = "2 hours"): DataFrame = {
    val clicks = clicksRaw
      .filter(col("event_type") === "click")
      .withColumn("click_time", Sessions.nsToTimestamp(col("ts")))
      .withWatermark("click_time", watermarkDelay)
      .select(
        col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("click_time"))
    val purchases = purchasesRaw
      .filter(col("event_type") === "purchase")
      .withColumn("purchase_time", Sessions.nsToTimestamp(col("ts")))
      .withWatermark("purchase_time", watermarkDelay)
      .select(
        col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("purchase_time"))
    purchases.join(
      clicks,
      col("p_user_id") === col("c_user_id") &&
        col("click_time") >=
          col("purchase_time") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("click_time") <= col("purchase_time"),
      "left_outer")
      .select(
        col("purchase_id"), col("p_user_id").as("user_id"),
        col("click_id"), col("purchase_time"), col("click_time"))
  }

  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionOut(userId: Long, sessionStartUs: Long, sessionEndUs: Long, nEvents: Long)

  /** Stateful sessionization with mapGroupsWithState: per-user session
    * accumulator keyed by user, closing a session when the inactivity gap
    * exceeds `gapMinutes` (processing-time flavour of Sessions.sessionize;
    * emits the LAST open session per user per batch — the demo shape for
    * KeyValueGroupedDataset state).
    */
  def sessionizeStream(
      spark: SparkSession, events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000 * 1000
    events
      .withColumn("ts_us", Sessions.nsToUs(col("ts")))
      .select($"user_id", $"ts_us")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[SessionState]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(SessionState(sorted.head, sorted.head, 0))
          sorted.foreach { t =>
            st =
              if (st.n == 0L) SessionState(t, t, 1)
              else if (t - st.end > gapUs) SessionState(t, t, 1) // new session
              else st.copy(end = t, n = st.n + 1)
          }
          state.update(st)
          SessionOut(user, st.start, st.end, st.n)
      }
      .toDF()
  }

  /** CLOSED sessions via flatMapGroupsWithState: a session is emitted the
    * moment a larger inactivity gap arrives (0..n outputs per user per
    * batch — the flatMap shape); the still-open tail stays in state. This is
    * the production form of streaming sessionization: output rows are final,
    * never revised.
    *
    * Correctness guards: (a) an out-of-order event WITHIN the gap never
    * moves the session end backwards (`end = max(end, t)` — a cross-batch
    * straggler extends counts, not boundaries); (b) idle sessions are
    * closed by an EVENT-TIME timeout — once the watermark passes
    * `session end + gap` the open tail is emitted and its per-user state
    * removed, so state is bounded and every session is eventually output
    * even for users who never return.
    */
  def closedSessionsStream(
      spark: SparkSession, events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours"): DataFrame = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000 * 1000
    events
      .withColumn("event_time", Sessions.nsToTimestamp(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .withColumn("ts_us", Sessions.nsToUs(col("ts")))
      // keep the watermarked column in the grouped Dataset — pruning it
      // before the stateful operator drops the watermark and EventTimeTimeout
      // fails analysis
      .select($"user_id", $"ts_us", $"event_time")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(SessionOut(user, st.start, st.end, st.n))
          } else {
            val sorted = rows.map(_._2).toSeq.sorted
            val closed = Seq.newBuilder[SessionOut]
            var st = state.getOption.orNull
            sorted.foreach { t =>
              st =
                if (st == null) SessionState(t, t, 1)
                else if (t - st.end > gapUs) {
                  closed += SessionOut(user, st.start, st.end, st.n)
                  SessionState(t, t, 1)
                } else st.copy(end = math.max(st.end, t), n = st.n + 1)
            }
            if (st != null) {
              state.update(st)
              // event-time ms at which this session becomes idle-closed
              state.setTimeoutTimestamp((st.end + gapUs) / 1000)
            }
            closed.result().iterator
          }
      }
      .toDF()
  }
}
