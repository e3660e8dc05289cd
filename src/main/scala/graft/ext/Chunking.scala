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

  /** Sentence-aware budget chunking (E152): sentences (split on `[.!?]+ *`,
    * a Java∩RE2 pattern — no lookbehind) keep their order, and each
    * sentence joins the chunk its cumulative-token START offset falls in
    * (chunk = ⌊cum_before / budget⌋ — the same quantized-fill semantics as
    * [[graft.ops.Packing.packGreedy]], but with sentence granularity so no
    * sentence is ever split mid-way). Output is one row per (doc, chunk)
    * with sentence and token counts — the RAG-ingest layout where chunk
    * boundaries respect sentences.
    *
    * Blank pseudo-sentences (consecutive enders, trailing punctuation) are
    * dropped before counting. A doc with no ender is one sentence.
    *
    * Scale: the split/explode is map-side; the only shuffle is the
    * per-doc cumulative window (keyed by doc id, bounded by the doc's own
    * sentence count) and the final (doc, chunk) aggregation, which reuses
    * that partitioning.
    */
  def sentenceChunks(
      docs: DataFrame,
      budget: Long = 40L,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val sent = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), "[.!?]+ *")).as(Seq("idx", "s")))
      .filter(length(trim(col("s"))) > 0)
      .withColumn("ntok", size(split(col("s"), " ")).cast("long"))
    val w = Window.partitionBy("id").orderBy("idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    sent
      .withColumn("cum_before", coalesce(sum(col("ntok")).over(w), lit(0L)))
      .withColumn("chunk_id", ExactMath.floorDiv(col("cum_before"), lit(budget)))
      .groupBy(col("id").as(idCol), col("chunk_id"))
      .agg(
        count(lit(1)).as("n_sentences"),
        sum(col("ntok")).cast("long").as("n_tokens"))
  }
}
