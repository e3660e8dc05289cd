package graft.streaming

import graft.ext.Drift
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming distribution-drift monitor: as documents stream in, running
  * per-key counts accumulate and every micro-batch emits a drift report
  * against a fixed reference distribution (the promoted corpus freeze).
  * The streaming observability twin of [[graft.ext.Drift.distributionDrift]]
  * — the batch report answers "did the mix shift between freezes", this one
  * answers "is the mix shifting NOW" while the feed is live.
  *
  * State layout: each batch's counts land under `countsPath/batch_id=N`
  * through [[BatchSink.writeOnce]] (atomic temp-dir rename + `_SUCCESS`
  * validation ⇒ a re-delivered batch finds its partition complete and
  * writes nothing, and a crash mid-write heals instead of undercounting —
  * exactly-once under foreachBatch's at-least-once contract), and the
  * running totals are one partition-pruned groupBy over that tree.
  * Per-batch cost is
  * O(batch + #keys), never O(stream history): the history is already
  * reduced to counts. The per-micro-batch directory the tree accumulates
  * is bounded by periodically folding it with
  * `BatchSink.compact(spark, countsPath, Seq("key"), Seq("n"))` — counts
  * are additive, so cumulative reads are identical before and after.
  */
object DriftMonitor {

  /** Fold one batch into the count store and return the drift report of the
    * cumulative distribution vs `refCounts` ((key, n_ref) rows, e.g. from
    * `ref.groupBy(key).count()`). Re-invoking with the same `batchId`
    * skips the write (partition already present) — same cumulative
    * state, same report.
    */
  def monitorBatch(
      batch: DataFrame, refCounts: DataFrame, keyCol: String,
      countsPath: String, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    // writeOnce is the idempotence mechanism: a re-delivered batch (same
    // batchId ⇒ same deterministic data under the foreachBatch contract)
    // finds its partition complete (_SUCCESS present) and writes nothing —
    // counts never double — while a torn partial from a crash is healed
    // rather than silently treated as the whole batch
    BatchSink.writeOnce(
      batch.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n")),
      s"$countsPath/batch_id=$batchId")
    // finish any compact() swap that crashed mid-way before reading
    BatchSink.healPending(spark, countsPath)
    val cum = spark.read.parquet(countsPath)
      .groupBy("key").agg(sum("n").as("n_cur"))
    Drift.driftFromCounts(
      refCounts.select(col("key"), col("n_ref")), cum)
      .withColumn("batch_id", lit(batchId))
  }

  /** Run [[monitorBatch]] over a document stream, appending each batch's
    * report to `reportPath` (re-delivery skips the existing partition —
    * the report table stays exactly-once too).
    */
  def stream(
      docs: DataFrame, refCounts: DataFrame, keyCol: String,
      countsPath: String, reportPath: String, checkpoint: String,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val pinnedRef = refCounts.localCheckpoint()
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the partition dir carries batch_id; drop the column so reading
        // the report root doesn't see it twice (dir value wins on read)
        BatchSink.writeOnce(
          monitorBatch(batch, pinnedRef, keyCol, countsPath, batchId)
            .drop("batch_id"),
          s"$reportPath/batch_id=$batchId")
        // bound the count tree's listing growth; foreachBatch bodies run
        // serially, so this is safely "between micro-batches"
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1) {
          BatchSink.compact(batch.sparkSession, countsPath, Seq("key"), Seq("n"))
        }
        ()
      }
      .start()
  }
}
