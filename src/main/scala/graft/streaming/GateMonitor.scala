package graft.streaming

import graft.ext.{ExactMath, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus-gate monitor: the live twin of
  * [[graft.ext.CorpusPipeline.releaseScorecard]]'s map-side gates. As
  * documents stream in, every micro-batch is scored (code-likeness,
  * sentence-vote language mixing, quality) and folded into cumulative gate
  * counters, and each batch emits the running scorecard — "is this feed
  * starting to ship code / code-switched text / junk RIGHT NOW", hours
  * before a batch release audit would see it.
  *
  * The near-dup gate is deliberately absent here: duplication is a
  * CROSS-document property with its own streaming path
  * ([[CorpusIngest]]'s incremental batch-vs-corpus dedup); this monitor
  * owns the per-document gates, which are map-side and need no state
  * beyond the counters.
  *
  * State/idempotence layout is [[DriftMonitor]]'s: per-batch counter rows
  * land under `statePath/batch_id=N` through [[BatchSink.writeOnce]]
  * (atomic rename + `_SUCCESS` validation — a re-delivered batch finds its
  * partition complete and writes nothing; a torn partial heals), the
  * cumulative scorecard is one partition-pruned aggregation over that
  * tree, and the per-batch report lands under `reportPath/batch_id=N` the
  * same way — exactly-once counters and reports under foreachBatch's
  * at-least-once contract. Per-batch cost is O(batch) + O(#batches)
  * counter rows.
  */
object GateMonitor {

  /** Per-doc gate columns → one counter row for the batch. */
  private def gateCounts(batch: DataFrame, textCol: String): DataFrame = {
    val scored = batch
      .select(col(textCol).as("__t"))
      .withColumn("__q6",
        floor(TextAnalysis.qualityScore(col("__t")) * 1000000.0).cast("long"))
    val code = TextAnalysis.codeScore(
      scored.withColumn("__id", monotonically_increasing_id()),
      "__t", "__id")
    val mixed = TextAnalysis.langMixing(
      scored.withColumn("__id", monotonically_increasing_id()), "__id", "__t")
    // gates are map-side per doc; counting them per batch needs no join —
    // recompute each gate aggregate independently over the same batch
    val n = scored.agg(
      count(lit(1)).as("n_docs"), sum(col("__q6")).as("sq6"))
    val nCode = code.agg(
      sum(when(col("is_code"), 1L).otherwise(0L)).as("n_code"))
    val nMixed = mixed.agg(
      sum(when(col("is_mixed"), 1L).otherwise(0L)).as("n_mixed"))
    n.crossJoin(nCode).crossJoin(nMixed)
      .select(
        col("n_docs").cast("long").as("n_docs"),
        coalesce(col("n_code"), lit(0L)).cast("long").as("n_code"),
        coalesce(col("n_mixed"), lit(0L)).cast("long").as("n_mixed"),
        coalesce(col("sq6"), lit(0L)).cast("long").as("sq6"))
  }

  /** Fold one batch into the counter store and return the CUMULATIVE
    * scorecard (n_docs, gate counts, 2²⁰ shares, mean quality). Re-invoked
    * with the same batchId it skips the write and reproduces the same
    * report.
    */
  def monitorBatch(
      batch: DataFrame, textCol: String,
      statePath: String, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    BatchSink.writeOnce(gateCounts(batch, textCol), s"$statePath/batch_id=$batchId")
    val fp = lit(1048576L)
    val cum = spark.read.parquet(statePath).agg(
      sum(col("n_docs")).cast("long").as("n_docs"),
      sum(col("n_code")).cast("long").as("n_code"),
      sum(col("n_mixed")).cast("long").as("n_mixed"),
      sum(col("sq6")).cast("long").as("sq6"))
    cum.select(
      col("n_docs"), col("n_code"), col("n_mixed"),
      when(col("n_docs") > 0L,
        ExactMath.floorDiv(col("n_code") * fp, col("n_docs"))).otherwise(0L)
        .cast("long").as("code_share_fp"),
      when(col("n_docs") > 0L,
        ExactMath.floorDiv(col("n_mixed") * fp, col("n_docs"))).otherwise(0L)
        .cast("long").as("mixed_share_fp"),
      when(col("n_docs") > 0L,
        ExactMath.floorDiv(col("sq6"), col("n_docs"))).otherwise(0L)
        .cast("long").as("mean_quality_e6"))
      .withColumn("batch_id", lit(batchId))
  }

  /** Run [[monitorBatch]] over a document stream, appending each batch's
    * cumulative scorecard to `reportPath` exactly once.
    */
  def stream(
      docs: DataFrame, textCol: String,
      statePath: String, reportPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BatchSink.writeOnce(
          monitorBatch(batch, textCol, statePath, batchId).drop("batch_id"),
          s"$reportPath/batch_id=$batchId")
        ()
      }
      .start()
}
