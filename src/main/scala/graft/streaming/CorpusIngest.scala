package graft.streaming

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus ingest: every micro-batch of documents is near-dup
  * checked against the ACCUMULATED corpus before admission — the streaming
  * form of `Dedup.incrementalDedup`, run inside `foreachBatch` so the
  * corpus and its MinHash signature store advance transactionally with the
  * stream.
  *
  * Per batch: existing signatures are served from the persisted store (the
  * corpus itself is only consulted for the verify join of candidate pairs),
  * clean documents append to the corpus, their signatures append to the
  * store. Cost per batch is O(batch + candidates), never O(corpus) — the
  * property that lets a 100 TB corpus ingest a daily feed without
  * re-reading itself.
  *
  * Idempotence under foreachBatch's at-least-once contract: re-delivering a
  * batch re-detects its documents as duplicates of the copies already
  * admitted (identical text ⇒ Jaccard 1 ≥ any threshold), so re-delivery
  * admits nothing new.
  */
object CorpusIngest {

  /** Dedup `batch` against the store at `corpusPath`/`sigPath`, admit the
    * clean rows, and return the per-document verdicts. Batch-internal dups
    * resolve to the lowest id (the incrementalDedup contract).
    */
  def ingestBatch(
      batch: DataFrame, corpusPath: String, sigPath: String,
      textCol: String = "text", idCol: String = "doc_id",
      minJaccard: Double = 0.7): DataFrame = {
    val spark = batch.sparkSession
    val corpusDir = new java.io.File(corpusPath)
    val haveCorpus = corpusDir.exists()
    val existing =
      if (haveCorpus) spark.read.parquet(corpusPath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
    val sigs =
      if (haveCorpus) Some(spark.read.parquet(sigPath))
      else None
    val verdicts = Dedup.incrementalDedup(
      batch, existing, textCol, idCol, minJaccard, sigs)
    val admitted = batch.join(
      verdicts.filter(!col("is_dup")).select(idCol), Seq(idCol), "left_semi")
    // pin admissions before appending: both writes must see the same rows
    val pinned = admitted.localCheckpoint()
    pinned.write.mode(SaveMode.Append).parquet(corpusPath)
    Dedup.minhashSignatures(pinned, textCol, idCol)
      .write.mode(SaveMode.Append).parquet(sigPath)
    verdicts
  }

  /** Run [[ingestBatch]] over a stream of documents. */
  def stream(
      docs: DataFrame, corpusPath: String, sigPath: String, checkpoint: String,
      textCol: String = "text", idCol: String = "doc_id",
      minJaccard: Double = 0.7,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, corpusPath, sigPath, textCol, idCol, minJaccard)
        ()
      }
      .start()
}
