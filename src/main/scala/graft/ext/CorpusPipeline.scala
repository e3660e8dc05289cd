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

  /** Dataset card: the one-call headline summary a corpus release ships —
    * sizes, diversity, exact-dup rate, mean quality, dominant language —
    * as narrow (metric, value_num, value_str) rows.
    *
    * Exactness discipline: every numeric is either an integer carried in a
    * double (exact), a SINGLE long/long IEEE division (`exact_dup_rate` —
    * correctly rounded, engine-identical), or an integer floor-division of
    * a ×10⁶-scaled quality sum (`mean_quality_e6` — no float accumulation
    * at all). Scale: ONE full scan feeding one global aggregate, plus a
    * lang-count aggregate for the argmax; nothing is collected.
    */
  def datasetCard(
      docs: DataFrame, textCol: String = "text", langCol: String = "lang",
      sourceCol: String = "source"): DataFrame = {
    val t = col(textCol)
    val enriched = docs.select(
      col(langCol).as("__lang"), col(sourceCol).as("__source"),
      length(t).as("__nc"),
      TextAnalysis.tokenCount(t).as("__nt"),
      md5(t).as("__dg"),
      floor(TextAnalysis.qualityScore(t) * 1000000.0).cast("long").as("__q6"))
    val agg = enriched.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("__source")).as("n_sources"),
      countDistinct(col("__lang")).as("n_langs"),
      sum(col("__nt")).cast("long").as("total_tokens"),
      sum(col("__nc")).cast("long").as("total_chars"),
      (count(lit(1)) - countDistinct(col("__dg"))).as("dup_docs"),
      sum(col("__q6")).cast("long").as("__sq6"))
    val topLang = enriched.groupBy(col("__lang"))
      .agg(count(lit(1)).as("__ln"))
      .orderBy(col("__ln").desc, col("__lang").asc).limit(1)
      .select(col("__lang").as("top_lang"))
    def metric(name: String, num: org.apache.spark.sql.Column) =
      struct(lit(name).as("metric"), num.cast("double").as("value_num"),
        lit(null).cast("string").as("value_str"))
    agg.crossJoin(broadcast(topLang))
      .select(explode(array(
        metric("n_docs", col("n_docs")),
        metric("n_sources", col("n_sources")),
        metric("n_langs", col("n_langs")),
        metric("total_tokens", col("total_tokens")),
        metric("total_chars", col("total_chars")),
        metric("dup_docs", col("dup_docs")),
        metric("exact_dup_rate",
          col("dup_docs").cast("double") / col("n_docs").cast("double")),
        metric("mean_quality_e6",
          ExactMath.floorDiv(col("__sq6"), col("n_docs"))),
        struct(lit("top_lang").as("metric"), lit(null).cast("double").as("value_num"),
          col("top_lang").as("value_str")))).as("m"))
      .select(col("m.metric").as("metric"), col("m.value_num").as("value_num"),
        col("m.value_str").as("value_str"))
  }

  /** Release scorecard (E159): ONE row with every corpus gate this library
    * ships, computed in one composed plan — document count, code-likeness
    * hits, mixed-language docs, near-dup removals, and the mean quality
    * score, each with its exact 2²⁰ share of the corpus. The table a
    * release review actually reads; each column is the headline of a
    * deeper per-doc report (q182/q198/q188/q17).
    *
    * Scale: every input is an existing audit (map-side scoring, LSH-scoped
    * dedup, sentence-vote langid); the scorecard adds three id-keyed joins
    * and a 1-row reduce on top.
    */
  def releaseScorecard(
      docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import graft.ext.{Dedup, TextAnalysis}
    val code = TextAnalysis.codeScore(docs, textCol, idCol)
      .select(col(idCol), col("is_code"))
    val mix = TextAnalysis.langMixing(docs, idCol, textCol)
      .select(col(idCol), col("is_mixed"))
    val pairs = Dedup.nearDuplicates(docs, textCol, idCol, minJaccard = 0.5)
      .select("id_a", "id_b")
    val cl = Dedup.dedupClusters(pairs).withColumnRenamed("id", idCol)
    val fp = lit(1048576L)
    val base = docs
      .select(col(idCol),
        floor(TextAnalysis.qualityScore(col(textCol)) * 1000000.0).cast("long")
          .as("q6"))
      .join(code, Seq(idCol))
      .join(mix, Seq(idCol), "left")
      .join(cl, Seq(idCol), "left")
      .select(col("q6"), col("is_code"),
        coalesce(col("is_mixed"), lit(false)).as("is_mixed"),
        (col("canonical_id").isNotNull && col("canonical_id") =!= col(idCol))
          .as("removed"))
    val counted = base.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("is_code"), 1L).otherwise(0L)).cast("long").as("n_code"),
      sum(when(col("is_mixed"), 1L).otherwise(0L)).cast("long").as("n_mixed"),
      sum(when(col("removed"), 1L).otherwise(0L)).cast("long").as("n_dup_removed"),
      sum(col("q6")).cast("long").as("sq6"))
    counted.select(
      col("n_docs"), col("n_code"), col("n_mixed"), col("n_dup_removed"),
      ExactMath.floorDiv(col("n_code") * fp, col("n_docs")).as("code_share_fp"),
      ExactMath.floorDiv(col("n_mixed") * fp, col("n_docs")).as("mixed_share_fp"),
      ExactMath.floorDiv(col("n_dup_removed") * fp, col("n_docs")).as("dup_share_fp"),
      ExactMath.floorDiv(col("sq6"), col("n_docs")).as("mean_quality_e6"))
  }
}
