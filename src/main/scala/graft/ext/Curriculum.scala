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
}
