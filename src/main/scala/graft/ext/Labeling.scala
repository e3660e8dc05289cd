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

  /** Calibration / reliability report (E143): bucket predictions by their
    * 2²⁰ fixed-point confidence into `bins` equal-width bins and compare
    * each bin's mean confidence against its empirical accuracy — the
    * reliability diagram behind expected-calibration-error (ECE), as exact
    * integers. Per bin:
    *
    *   gap_num = |n_correct·2²⁰ − Σ conf_fp|
    *
    * is the bin's ECE numerator: ECE_fp = (Σ_bins gap_num) // n_total, a
    * floor the caller (or the oracle) takes over the returned rows. No
    * float division anywhere, so Spark and DuckDB agree bit-for-bit.
    *
    * Scale: one map-side-combined hash aggregation to ≤ `bins` rows.
    */
  def calibrationReport(
      preds: DataFrame,
      confFp: Column,
      correct: Column,
      bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val bin = least(
      graft.ext.ExactMath.floorDiv(confFp * bins, lit(1048576L)),
      lit(bins - 1L)).cast("long")
    preds.select(bin.as("bin"), confFp.cast("long").as("conf_fp"),
        correct.cast("boolean").as("ok"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("ok"), 1L).otherwise(0L)).cast("long").as("n_correct"),
        sum(col("conf_fp")).cast("long").as("sum_conf_fp"))
      .select(
        col("bin"), col("n"), col("n_correct"),
        graft.ext.ExactMath.floorDiv(col("n_correct") * lit(1048576L), col("n"))
          .as("acc_fp"),
        graft.ext.ExactMath.floorDiv(col("sum_conf_fp"), col("n")).as("conf_avg_fp"),
        abs(col("n_correct") * lit(1048576L) - col("sum_conf_fp")).cast("long")
          .as("gap_num"))
  }

  /** Rank AUC (E149): the Mann–Whitney AUC of a score separating a binary
    * label, as exact integers with midrank tie handling. With per-distinct-
    * value counts c_v (p_v of them positive) and C_v values strictly below
    * v, the doubled midrank is rank2_v = 2·C_v + c_v + 1 and
    *
    *   AUC = (Σ_v p_v·rank2_v − n₁(n₁+1)) / (2·n₁·n₀)
    *
    * reported as numerator (`u2_num`), denominator, and a 2²⁰ fixed-point
    * floor quotient. AUC ≈ 0.5 = the score carries no signal for the
    * label; this is the score-validation gate ("does my quality score
    * actually predict near-dup membership / spam / keep-decisions?") run
    * before a score is allowed to gate a corpus.
    *
    * Scale: one hash aggregation to distinct score values, then a window
    * over THAT table only (the rankFusion discipline — distinct values,
    * never corpus rows, are globally ordered), then a 1-row reduce.
    * Degenerate labels (no positives or no negatives) report auc_fp = 0.
    */
  def rankAuc(df: DataFrame, scoreCol: String, positive: Column): DataFrame = {
    val rows = df
      .select(col(scoreCol).as("v"), when(positive, 1L).otherwise(0L).as("y"))
      .filter(col("v").isNotNull)
    val counts = rows.groupBy("v")
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val below = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = counts.withColumn("cbefore",
      coalesce(sum(col("c")).over(below), lit(0L)))
    val t = cum.agg(
      sum(col("p")).cast("long").as("n_pos"),
      sum(col("c") - col("p")).cast("long").as("n_neg"),
      sum(col("p") * (col("cbefore") * 2L + col("c") + 1L)).cast("long").as("r2sum"))
    val u2 = col("r2sum") - col("n_pos") * (col("n_pos") + 1L)
    t.select(
      col("n_pos"), col("n_neg"),
      u2.cast("long").as("u2_num"),
      (col("n_pos") * col("n_neg") * 2L).cast("long").as("u2_den"),
      when(col("n_pos") > 0L && col("n_neg") > 0L,
        graft.ext.ExactMath.floorDiv(
          u2 * lit(1048576L), col("n_pos") * col("n_neg") * 2L))
        .otherwise(0L).cast("long").as("auc_fp"))
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
