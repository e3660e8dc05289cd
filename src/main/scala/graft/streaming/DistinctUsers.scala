package graft.streaming

import graft.ext.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming distinct-key counting over an event feed: every micro-batch
  * writes its own HLL register set, the readout merges registers with MAX
  * — the streaming demonstration of the HLL sketch's mergeability. State
  * is ≤ groups × m register rows per batch regardless of stream size;
  * exact distinct over a stream would need unbounded keyed state.
  *
  * State layout mirrors [[DriftMonitor]]/[[TrendingTerms]]: the register
  * store partitions by batch_id and re-delivery skips its already-complete
  * partition ([[BatchSink.writeOnce]] — atomic rename + `_SUCCESS`
  * validation), so the monitor is idempotent under foreachBatch's
  * at-least-once contract — and MAX-merge makes even a logically
  * duplicated register set harmless (max is idempotent twice over).
  */
object DistinctUsers {

  /** Fold one batch's registers in; return the current per-group estimate
    * (group, n_zero_registers, raw_estimate) with the batch id stamped.
    */
  def monitorBatch(
      batch: DataFrame, groupCol: String, keyCol: String,
      statePath: String, batchId: Long, m: Int = 64): DataFrame = {
    val spark = batch.sparkSession
    BatchSink.writeOnce(
      Sketches.hllRegistersBy(batch, groupCol, keyCol, m),
      s"$statePath/reg/batch_id=$batchId")
    val merged = spark.read.parquet(s"$statePath/reg")
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("max_rho")).cast("long").as("max_rho"))
    Sketches.hllRawEstimateBy(merged, groupCol, m)
      .withColumn("batch_id", lit(batchId))
  }

  /** Run [[monitorBatch]] over a stream, one exactly-once report partition
    * per batch under `reportPath`.
    */
  def stream(
      events: DataFrame, groupCol: String, keyCol: String,
      statePath: String, reportPath: String, checkpoint: String,
      m: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BatchSink.writeOnce(
          monitorBatch(batch, groupCol, keyCol, statePath, batchId, m)
            .drop("batch_id"),
          s"$reportPath/batch_id=$batchId")
        ()
      }
      .start()
}
