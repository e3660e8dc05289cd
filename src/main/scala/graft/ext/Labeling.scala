package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Consensus over repeated labels — the QA pass for any dataset where the
  * same item was labeled more than once (multiple annotators, repeated
  * model votes, merged feeds): per item, the majority label, its support,
  * and the disagreement flags that decide whether the item is usable as
  * training signal or needs re-annotation.
  */
object Labeling {

  /** Per-item consensus report. Majority = highest vote count, lowest
    * label as the deterministic tiebreak; `is_tie` marks items where two
    * or more labels share the top count (the tiebreak picked one, but the
    * item is genuinely ambiguous); `unanimous` marks items with a single
    * distinct label. Null labels are abstentions and are dropped.
    *
    * Scale: one hash aggregation to (item, label) counts — map-side
    * combined, so the shuffle carries distinct pairs, not votes — then a
    * per-item window over those counts (≤ |labels| rows per item) and one
    * final per-item fold.
    */
  def consensus(df: DataFrame, itemCol: String, labelCol: String): DataFrame = {
    val counts = df.filter(col(labelCol).isNotNull)
      .groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("n"))
    val byItem = Window.partitionBy(col(itemCol))
    val ranked = counts
      .withColumn("max_n", max(col("n")).over(byItem))
      .withColumn("rk",
        row_number().over(byItem.orderBy(col("n").desc, col(labelCol).asc)))
    ranked.groupBy(col(itemCol))
      .agg(
        sum(col("n")).cast("long").as("n_votes"),
        count(lit(1)).as("n_distinct_labels"),
        min(when(col("rk") === 1, col(labelCol))).as("majority_label"),
        min(when(col("rk") === 1, col("n"))).cast("long").as("majority_votes"),
        (sum(when(col("n") === col("max_n"), 1L).otherwise(0L)) > 1L).as("is_tie"))
      .withColumn("unanimous", col("n_distinct_labels") === 1L)
  }

  /** Cohen's kappa between two label columns (two annotators, or a
    * predictor against gold labels) as exact integers: with n pairs,
    * `agree_n` agreements, and pe_num = Σ_k rowTotal_k · colTotal_k,
    *
    *   kappa = (n·agree_n − pe_num) / (n² − pe_num)
    *
    * is reported as its integer numerator/denominator plus a 2²⁰
    * fixed-point floor quotient — chance-corrected agreement with no
    * cross-engine float division. A degenerate table (both sides a single
    * constant label → denominator 0) reports kappa_fp = 0.
    *
    * Scale: two label-marginal aggregations (|labels| rows each), joined
    * on label, cross-joined with the 1-row totals — the pair table itself
    * is scanned twice (once for totals, once per marginal side), each a
    * map-side-combined hash aggregate.
    */
  def agreementKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val pairs = df.select(a.as("a"), b.as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val totals = pairs.agg(
      count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).cast("long").as("agree_n"))
    val rowM = pairs.groupBy(col("a").as("lbl")).agg(count(lit(1)).as("na"))
    val colM = pairs.groupBy(col("b").as("lbl")).agg(count(lit(1)).as("nb"))
    val pe = rowM.join(colM, "lbl")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).cast("long").as("pe_num"))
    val num = col("n") * col("agree_n") - col("pe_num")
    val den = col("n") * col("n") - col("pe_num")
    totals.crossJoin(pe).select(
      col("n"), col("agree_n"), col("pe_num"),
      num.cast("long").as("kappa_num"),
      den.cast("long").as("kappa_den"),
      when(den === 0L, 0L)
        .otherwise(graft.ext.ExactMath.floorDiv(num * lit(1048576L), den))
        .cast("long").as("kappa_fp"))
  }
}
