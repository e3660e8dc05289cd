package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction: collapse an ordered upsert/delete log
  * into the latest snapshot — the read-side of every CDC ingest (Debezium
  * streams, database binlogs, mutable-feed exports) before the data can
  * join a batch pipeline. Scd2 keeps the full history; this keeps only
  * what is CURRENT.
  */
object Cdc {

  /** Latest-wins snapshot of a CDC log: per key, order events by
    * (`tsCol`, `seqCol`) and keep the last — unless that last operation
    * is a delete (`opCol` == 'D'), in which case the key leaves the
    * snapshot entirely. Emits the surviving keys with their last value
    * columns, the time of the final write, and the per-key op count
    * (replay-depth telemetry: keys with huge counts are compaction
    * candidates at the source).
    *
    * Scale: one shuffle on key; the window computes row_number and count
    * in the same pass over the same partitioning — no second exchange.
    * Skewed hot keys are bounded by their own log length, not the table.
    */
  def latestSnapshot(
      log: DataFrame, keyCol: String, tsCol: String, seqCol: String,
      opCol: String, valueCols: Seq[String]): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val ordered = byKey.orderBy(col(tsCol).desc, col(seqCol).desc)
    log
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("n_ops", count(lit(1)).over(byKey))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .select(col(keyCol) +: valueCols.map(col) :+
        col(tsCol).as("last_ts") :+ col("n_ops").cast("long").as("n_ops"): _*)
  }
}
