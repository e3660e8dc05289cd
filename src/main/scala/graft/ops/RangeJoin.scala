package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — match points to the intervals containing them, with NO equi
  * key. Spark's planner turns a bare inequality join into a broadcast
  * nested-loop (or cartesian) — O(|points|·|intervals|) comparisons. The
  * scale layout is interval bucketing:
  *
  *   1. pick a bucket width (≈ typical interval length);
  *   2. explode each interval into the buckets it covers (an interval of
  *      length L lands in ⌈L/width⌉+1 buckets);
  *   3. bucket each point (one bucket each);
  *   4. EQUI-join on the bucket id — hash join, shuffle keyed by bucket —
  *      then filter exact containment.
  *
  * Work is |points| + Σ(interval spans)/width candidate rows instead of the
  * full cross product; the planner gets an equi key so every join strategy
  * (hash, SMJ, AQE skew split) applies. Overlapping intervals simply yield
  * one output row per (point, containing interval).
  */
object RangeJoin {

  /** `points(ptCol)` ∈ [`startCol`, `endCol`) of `intervals`; all three are
    * int64 (e.g. epoch ns). Output: every point row × its containing
    * interval rows (inner join — points in no interval drop out).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // integer `div`, NOT floor(x / w): the double division loses exactness
    // past 2^53, and epoch-ns values live at ~2^60 — a point within a few
    // hundred ns of a bucket boundary could land in the wrong bucket.
    // Timestamps are non-negative, so truncating div == floor div.
    val ib = intervals.withColumn(
      "_bucket",
      explode(sequence(
        expr(s"`$startCol` div $bucketWidth"),
        expr(s"(`$endCol` - 1) div $bucketWidth"))))
    val pb = points.withColumn("_bucket", expr(s"`$ptCol` div $bucketWidth"))
    pb.join(ib, Seq("_bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bucket")
  }
}
