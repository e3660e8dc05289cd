package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap analytics: how many intervals are open at once, and
  * when the load peaks — connection-pool sizing, concurrent-session
  * audits, "how parallel was the pipeline" questions over (start, end)
  * interval tables.
  */
object Concurrency {

  /** Peak number of simultaneously-open intervals per key, with the
    * earliest instant the peak is reached.
    *
    * Semantics: intervals are half-open `[start, end)` — an interval
    * ending at t does NOT overlap one starting at t. The sweep is the
    * classic ±1 event walk: +1 at each start, −1 at each end, running sum
    * ordered by (t, delta) so that at equal timestamps the −1s land first
    * (half-open), with the default RANGE frame so simultaneous identical
    * events are peers and the count never shows a half-applied batch.
    *
    * Scale: a single per-key window would sort one key's entire timeline
    * in one task — a straggler when a key holds billions of events. The
    * sweep is therefore two-level, mirroring AsOfJoin's bucketed variant:
    * events are sliced into `bucketUs`-wide time buckets; each (key,
    * bucket) computes its local running sums independently, a prefix sum
    * over the bucket TOTALS (one row per non-empty bucket — tiny) gives
    * each bucket its carry-in, and the true running count is carry +
    * local. No task ever sees more than one bucket of one key.
    */
  def peakConcurrency(
      intervals: DataFrame,
      keyCol: String,
      startUsCol: String,
      endUsCol: String,
      bucketUs: Long = 86400000000L): DataFrame = {
    val k = col(keyCol)
    val ev = intervals
      .select(k, col(startUsCol).cast("long").as("t"), lit(1L).as("d"))
      .unionByName(intervals.select(k, col(endUsCol).cast("long").as("t"), lit(-1L).as("d")))
      .withColumn("bucket", graft.ext.ExactMath.floorDiv(col("t"), lit(bucketUs)))

    val localW = Window.partitionBy(k, col("bucket")).orderBy(col("t").asc, col("d").asc)
    val local = ev.withColumn("rs_local", sum(col("d")).over(localW))

    val carryW = Window.partitionBy(k).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = ev.groupBy(k, col("bucket"))
      .agg(sum(col("d")).as("tot"))
      .withColumn("carry", coalesce(sum(col("tot")).over(carryW), lit(0L)))
      .drop("tot")

    local.join(carries, Seq(keyCol, "bucket"))
      .withColumn("rs", col("carry") + col("rs_local"))
      .groupBy(k)
      .agg(
        sum(when(col("d") === 1L, 1L).otherwise(0L)).cast("long").as("n_intervals"),
        // max over (count, -t): maximal count, then earliest instant.
        max(struct(col("rs").as("peak"), (-col("t")).as("neg_t"))).as("__m"))
      .select(k, col("n_intervals"),
        col("__m.peak").cast("long").as("peak"),
        (-col("__m.neg_t")).cast("long").as("peak_t_us"))
  }
}
