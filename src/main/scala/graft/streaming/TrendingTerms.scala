package graft.streaming

import graft.ext.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming heavy-hitter tracking over a document feed: every micro-batch
  * folds its token counts into a persisted count-min sketch and its local
  * top-k into a persisted candidate set, then reports the current global
  * top-k by sketch estimate. The streaming demonstration of the CMS
  * sketch's mergeability — per-batch cost is O(batch + depth·width +
  * |candidates|), never O(stream history).
  *
  * Why sketch + candidates: the exact global token counts would need
  * unbounded keyed state; the CMS caps count state at depth·width cells
  * (one-sided overestimates only), and the candidate set caps the key
  * space at k·batches — any term that is ever globally heavy must be
  * locally heavy in at least one batch (it cannot hide below every batch's
  * top-k forever while outgrowing them in total).
  *
  * State layout mirrors [[DriftMonitor]]: both stores partition by
  * batch_id and re-delivery skips its already-complete partition
  * ([[BatchSink.writeOnce]] — atomic rename + `_SUCCESS` validation), so
  * counts never double and the monitor is idempotent under foreachBatch's
  * at-least-once contract.
  */
object TrendingTerms {

  /** Fold one batch in; return the current global top-k (term, estimate). */
  def monitorBatch(
      batch: DataFrame, textCol: String,
      statePath: String, batchId: Long,
      depth: Int = 4, width: Int = 1024, topK: Int = 10): DataFrame = {
    val spark = batch.sparkSession
    val toks = batch
      .select(explode(split(lower(col(textCol)), " ")).as("token"))
      .where(length(col("token")) > 0)
    // writeOnce is the idempotence mechanism: a re-delivered batch (same
    // batchId ⇒ same deterministic data under the foreachBatch contract)
    // finds its partition complete and writes nothing — counts never
    // double — and a torn partial from a crash heals instead of silently
    // passing as the whole batch
    BatchSink.writeOnce(
      Sketches.cmsBuild(toks, "token", depth, width),
      s"$statePath/sketch/batch_id=$batchId")
    BatchSink.writeOnce(
      toks.groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc).limit(topK)
        .select("token"),
      s"$statePath/cand/batch_id=$batchId")
    // finish any compact() swap that crashed mid-way before reading
    BatchSink.healPending(spark, s"$statePath/sketch")
    BatchSink.healPending(spark, s"$statePath/cand")
    val merged = spark.read.parquet(s"$statePath/sketch")
      .groupBy("row_i", "pos").agg(sum(col("c")).cast("long").as("c"))
    val candidates = spark.read.parquet(s"$statePath/cand")
      .select("token").distinct()
    Sketches.cmsEstimate(candidates, "token", merged, depth, width)
      .orderBy(col("cms_estimate").desc, col("token").asc).limit(topK)
      .withColumn("batch_id", lit(batchId))
  }

  /** Run [[monitorBatch]] over a stream, one exactly-once report partition
    * per batch under `reportPath`.
    */
  def stream(
      docs: DataFrame, textCol: String,
      statePath: String, reportPath: String, checkpoint: String,
      depth: Int = 4, width: Int = 1024, topK: Int = 10,
      compactEvery: Int = 0,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BatchSink.writeOnce(
          monitorBatch(batch, textCol, statePath, batchId, depth, width, topK)
            .drop("batch_id"),
          s"$reportPath/batch_id=$batchId")
        // both state trees fold: the sketch additively, the candidate set
        // as a distinct union (no additive column)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1) {
          BatchSink.compact(batch.sparkSession, s"$statePath/sketch",
            Seq("row_i", "pos"), Seq("c"))
          BatchSink.compact(batch.sparkSession, s"$statePath/cand",
            Seq("token"), Seq.empty)
        }
        ()
      }
      .start()
}
