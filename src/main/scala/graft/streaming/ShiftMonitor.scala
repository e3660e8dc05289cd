package graft.streaming

import graft.ext.Drift
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming rate change-point monitor: as events stream in, per-batch
  * bucket counts accumulate and every micro-batch re-scores the cumulative
  * hourly-rate sequence for its CUSUM change point — the live twin of
  * [[graft.ext.Drift.changePoint]]. The batch report answers "when did
  * this feed's rate change" after the fact; this one keeps the answer
  * current while the feed is live, so a regime shift surfaces one
  * micro-batch after it happens.
  *
  * State layout mirrors [[DriftMonitor]]: each batch's (type, bucket)
  * counts land under `countsPath/batch_id=N` through
  * [[BatchSink.writeOnce]] (atomic rename + `_SUCCESS` validation ⇒
  * re-delivery finds its partition complete and writes nothing, a torn
  * partial heals). Per-batch cost is O(batch + observed buckets), never
  * O(stream history) — history is already reduced to bucket counts, and
  * the change-point windows run over the bucket table only. The one
  * stream-age-proportional cost left — one `batch_id=N` directory per
  * micro-batch in the listing — is bounded by periodically folding the
  * tree with `BatchSink.compact(spark, countsPath, Seq("etype", "bucket"),
  * Seq("n"))` (counts are additive, so reports are identical before and
  * after — ShiftMonitorSpec proves it).
  */
object ShiftMonitor {

  /** Fold one batch into the count store and return the current per-type
    * change points of the CUMULATIVE sequence. Re-invoking with the same
    * `batchId` skips the write — same state, same report.
    */
  def monitorBatch(
      batch: DataFrame,
      countsPath: String,
      batchId: Long,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      bucketNs: Long = 3600L * 1000000000L): DataFrame = {
    val spark = batch.sparkSession
    BatchSink.writeOnce(
      batch
        .select(col(typeCol).as("etype"), expr(s"$tsCol div $bucketNs").as("bucket"))
        .groupBy("etype", "bucket").agg(count(lit(1)).as("n")),
      s"$countsPath/batch_id=$batchId")
    // a compact() crashed mid-swap leaves the tree missing folded data
    // until the swap completes — finish it before any cumulative read
    BatchSink.healPending(spark, countsPath)
    val cum = spark.read.parquet(countsPath)
      .groupBy("etype", "bucket").agg(sum(col("n")).as("n"))
    Drift.changePointFromCounts(cum, typeCol)
      .withColumn("batch_id", lit(batchId))
  }

  /** Run [[monitorBatch]] over an event stream, appending each batch's
    * change-point report to `reportPath` exactly once. `compactEvery > 0`
    * folds the count tree every that-many batches (foreachBatch bodies run
    * serially, so "between micro-batches" holds by construction) —
    * bounding the tree's listing cost for the stream's whole life.
    */
  def stream(
      events: DataFrame,
      countsPath: String,
      reportPath: String,
      checkpoint: String,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      bucketNs: Long = 3600L * 1000000000L,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BatchSink.writeOnce(
          monitorBatch(batch, countsPath, batchId, tsCol, typeCol, bucketNs)
            .drop("batch_id"),
          s"$reportPath/batch_id=$batchId")
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1) {
          BatchSink.compact(batch.sparkSession, countsPath,
            Seq("etype", "bucket"), Seq("n"))
        }
        ()
      }
      .start()
}
