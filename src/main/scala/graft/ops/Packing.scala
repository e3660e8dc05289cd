package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: documents are laid out in
  * a fixed global order (by id) and cut into contiguous `capacity`-token
  * bins — each document's bin is the bin its START offset falls in (the
  * greedy contiguous-fill approximation; a straddling document stays with
  * its start bin, matching how packed-sequence writers emit).
  *
  * The global running offset is a DISTRIBUTED prefix sum, not a
  * single-partition window: ids are statically bucketed (`id div
  * bucketSize` — deterministic, no range-sampling), each bucket's token sum
  * aggregates map-side, the tiny bucket-sum table turns into per-bucket
  * starting offsets with one small window, and offsets broadcast-join back
  * onto the rows, where a per-bucket window finishes the cumsum. No stage
  * ever moves more than one bucket through one task, so the layout scales
  * to any corpus; only the bucket-sum table (|ids| / bucketSize rows) is
  * windowed globally — pick bucketSize so that table stays millions, and
  * recurse the same trick if it ever doesn't.
  *
  * Offsets go through decimal, not double, division (exact past 2⁵³ — a
  * 100 TB corpus is ~2⁴⁵ tokens, but the discipline is free).
  */
object Packing {

  /** One row per bin: bin, n_docs, total_tokens, fill_ratio. `weightCol`
    * must be a non-negative integral token count; `idCol` an integral id
    * defining the pack order.
    */
  def packGreedy(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      capacity: Long,
      bucketSize: Int = 1024): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val bucket = floor(col(idCol).cast("decimal(25,0)") / bucketSize).cast("long")
    val rows = docs.select(
      col(idCol).as("id"), col(weightCol).cast("long").as("w"), bucket.as("b"))
    val offsets = rows
      .groupBy("b")
      .agg(sum(col("w")).as("bsum"))
      .withColumn("offset",
        coalesce(
          sum(col("bsum")).over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("bsum")
    val local = Window.partitionBy("b").orderBy("id")
    rows
      .join(broadcast(offsets), "b")
      .withColumn("cum", col("offset") + sum(col("w")).over(local))
      .withColumn("bin",
        floor((col("cum") - col("w")).cast("decimal(25,0)") / capacity).cast("long"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("w")).as("total_tokens"),
        (sum(col("w")).cast("double") / lit(capacity.toDouble)).as("fill_ratio"))
  }
}
