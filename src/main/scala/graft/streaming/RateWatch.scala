package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming event-rate anomaly watch: every micro-batch appends its own
  * hourly (event_type, hour) counts to a batch-partitioned state store,
  * then re-runs [[graft.ext.Drift.rollingMadAnomalies]] over the MERGED
  * hourly series — the robust spike detector, kept current as events
  * arrive. Late events land in their true hour bucket at merge time (the
  * per-batch partials sum per hour), so the verdict converges to the
  * batch answer as the stream drains.
  *
  * State is hours × event-types per batch — aggregate-scale, never the
  * event stream — and follows the [[DriftMonitor]] idempotence layout:
  * batch_id partitions + [[BatchSink.writeOnce]] make re-delivery a no-op
  * and heal torn partials.
  */
object RateWatch {

  /** Fold one batch's hourly counts in; return current anomalies only. */
  def monitorBatch(
      batch: DataFrame, statePath: String, batchId: Long,
      window: Int = 24, k: Int = 3, minWindow: Int = 12): DataFrame = {
    val spark = batch.sparkSession
    BatchSink.writeOnce(
      Sessions.hourlyAgg(batch)
        .select(col("event_type"), col("hour"), col("n_events")),
      s"$statePath/hourly/batch_id=$batchId")
    val merged = spark.read.parquet(s"$statePath/hourly")
      .groupBy(col("event_type"), col("hour"))
      .agg(sum(col("n_events")).cast("long").as("n_events"))
    graft.ext.Drift.rollingMadAnomalies(
        merged, "event_type", "hour", "n_events", window, k, minWindow)
      .filter(col("is_anomaly"))
      .withColumn("batch_id", lit(batchId))
  }

  /** Run [[monitorBatch]] over a stream, one exactly-once anomaly report
    * partition per batch under `reportPath`.
    */
  def stream(
      events: DataFrame, statePath: String, reportPath: String,
      checkpoint: String, window: Int = 24, k: Int = 3, minWindow: Int = 12,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BatchSink.writeOnce(
          monitorBatch(batch, statePath, batchId, window, k, minWindow)
            .drop("batch_id"),
          s"$reportPath/batch_id=$batchId")
        ()
      }
      .start()
}
