package graft.ext

import org.apache.spark.sql.DataFrame
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
}
