package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-freeze pipeline: quality/repetition gate → exact
  * dedup (lowest-id copy survives) → deterministic train/val/test split.
  * This is the sequence that turns a raw crawl into a frozen training
  * corpus; every stage is one of the individually-tested operators, and
  * the whole chain is a pure function of the input — re-running it on the
  * same data reproduces the same corpus, byte for byte, on any cluster.
  *
  * Scale: the gate is map-only; dedup shuffles (digest, id) pairs; the
  * split is map-only. One shuffle end to end beyond the dedup aggregate —
  * the chain never materializes an intermediate corpus.
  */
object CorpusPipeline {

  /** Doc-level result: the surviving rows of `docs` (original columns
    * preserved) plus the `split` assignment.
    */
  def freeze(
      docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      trainPct: Int = 80, valPct: Int = 10, seed: Int = 0): DataFrame = {
    val metricCols = Seq("n_tokens", "top_unigram_n", "top_unigram_frac",
      "n_trigrams", "n_distinct_trigrams", "dup_trigram_ratio", "keep")
    val kept = TextAnalysis.withRepetitionMetrics(docs, textCol)
      .filter(col("keep"))
      .drop(metricCols: _*)
    val keepIds = Dedup.exact(kept, textCol, idCol)
      .select(col("keep_id").as(idCol))
    val deduped = kept.join(keepIds, Seq(idCol), "left_semi")
    Sampling.hashSplit(deduped, idCol, trainPct, valPct, seed)
  }

  /** Freeze manifest: per (split, stratum) doc and char counts — the
    * numbers a corpus release note reports.
    */
  def freezeSummary(
      docs: DataFrame, stratumCol: String = "lang",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    freeze(docs, textCol, idCol)
      .groupBy(col("split"), col(stratumCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).cast("long").as("total_chars"))
}
