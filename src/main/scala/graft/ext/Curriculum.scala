package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum ordering for training pipelines: equi-DEPTH difficulty
  * buckets (each holds ~1/B of the corpus) assigned WITHOUT a global sort.
  *
  * A naive `ntile(B) OVER (ORDER BY score)` funnels the whole corpus
  * through one partition. Instead:
  *   1. histogram the score column (hash aggregation, map-side combined;
  *      the histogram has one row per DISTINCT score — bounded by the
  *      score's value domain, not by corpus size),
  *   2. exclusive cumulative counts over the histogram (a window over the
  *      histogram only — thousands of rows even at 100 TB),
  *   3. `bucket(score) = cum_before·B div N`, broadcast back onto the data
  *      as a map-side equi-join.
  * Rows sharing a score always share a bucket (deterministic ties), so
  * bucket sizes are approximately-equal rather than exact — the property a
  * curriculum needs (stable assignment) over the one it doesn't (exact
  * quantile splits).
  */
object Curriculum {

  /** Adds a `bucket` column (0-based, ordered by ascending score). */
  def equiDepthBuckets(
      df: DataFrame, scoreCol: String, numBuckets: Int): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    val hist = df.groupBy(col(scoreCol)).agg(count(lit(1)).as("__n"))
    val w = Window.orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = hist
      .withColumn("__cum_before", coalesce(sum(col("__n")).over(w), lit(0L)))
    val total = df.agg(count(lit(1)).as("__total"))
    val assignment = withCum.crossJoin(broadcast(total))
      .select(
        col(scoreCol),
        ExactMath.floorDiv(col("__cum_before") * numBuckets, col("__total"))
          .as("bucket"))
    df.join(broadcast(assignment), Seq(scoreCol))
  }

  /** Gate-cost sweep (E166): what raising a score threshold costs. The
    * score distribution cuts into `bins` equi-depth buckets; each row is
    * a candidate threshold (the bucket's minimum score) with the EXACT
    * count of documents and weight (tokens) that survive gating at it —
    * "quality ≥ P70 keeps 31% of docs but 54% of tokens" read directly
    * off the table, before anyone commits a threshold constant.
    *
    * Scale: one hash aggregation to distinct score values (with doc and
    * weight sums), one window over THAT value table only, ≤ `bins` output
    * rows. Corpus rows are never globally sorted.
    */
  def gateCostSweep(
      df: DataFrame, scoreCol: String, weightCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val vals = df
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol))
      .agg(count(lit(1)).as("c"), sum(col(weightCol)).cast("long").as("w"))
    val before = Window.orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = vals
      .withColumn("cb", coalesce(sum(col("c")).over(before), lit(0L)))
      .withColumn("wb", coalesce(sum(col("w")).over(before), lit(0L)))
    val totals = vals.agg(
      sum(col("c")).cast("long").as("n"), sum(col("w")).cast("long").as("tw"))
    val fp = lit(1048576L)
    cum.crossJoin(broadcast(totals))
      .withColumn("bucket", ExactMath.floorDiv(col("cb") * bins, col("n")))
      .groupBy("bucket")
      .agg(
        min(col(scoreCol)).as("threshold"),
        (max(col("n")) - min(col("cb"))).cast("long").as("kept_docs"),
        (max(col("tw")) - min(col("wb"))).cast("long").as("kept_weight"),
        ExactMath.floorDiv((max(col("n")) - min(col("cb"))) * fp, max(col("n")))
          .as("kept_docs_fp"),
        ExactMath.floorDiv((max(col("tw")) - min(col("wb"))) * fp, max(col("tw")))
          .as("kept_weight_fp"))
      .select(col("bucket").cast("long").as("bucket"), col("threshold"),
        col("kept_docs"), col("kept_weight"),
        col("kept_docs_fp"), col("kept_weight_fp"))
  }
}
