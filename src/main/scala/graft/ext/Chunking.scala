package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for retrieval / context-window pipelines: cut each
  * document into fixed-size character windows with overlap.
  *
  * Chunk i covers [i·stride, i·stride + size); the last chunk starts at the
  * largest i with i·stride < len, so every character is covered and chunks
  * past the end are never emitted. `numChunks = 1 + (len-1) div stride` for
  * non-empty docs, 1 empty chunk for empty docs (so no document vanishes).
  *
  * Scale: `sequence` + explode is map-side — each input row expands to its
  * own chunks on the same executor, no shuffle. Fan-out is bounded by
  * len/stride, so output size tracks input size by a constant factor; at
  * 100 TB the chunker pipelines with the scan and the downstream sink
  * (ideally a `repartition` on chunk hash only if the sink needs balance).
  */
object Chunking {

  def numChunks(len: Column, stride: Int): Column =
    when(len <= 0, 1L)
      .otherwise(ExactMath.floorDiv(len - 1, lit(stride)) + 1L)

  /** Explode `textCol` into (chunk_idx, chunk_text) rows. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int = 500, stride: Int = 400): DataFrame = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    val len = length(col(textCol)).cast("long")
    df.select(
        col(idCol), col(textCol),
        explode(sequence(lit(0L), numChunks(len, stride) - 1L)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        substr(col(textCol), (col("chunk_idx") * stride + 1).cast("int"), lit(size))
          .as("chunk_text"))
  }
}
