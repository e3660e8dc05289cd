package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: users grouped by first-seen week, tracked by how many
  * return in each subsequent week — the standard product-analytics
  * triangle (cohort × offset → returning users, retention fraction).
  *
  * Weeks are epoch-µs floor-divided by a 7-day constant (integer-exact at
  * any timestamp magnitude — never double division); retention is the one
  * IEEE division at the end. Scale: (user, week) distinct + the cohort
  * min both shuffle on user — the same key — and the final cohort-size
  * join broadcasts a cohorts-count-sized table. No window over the full
  * event stream, no global sort.
  */
object Retention {

  private val WeekUs = 7L * 86400L * 1000000L

  /** Input needs `ts` (epoch nanoseconds) and `userCol`. Output: one row
    * per (cohort_week, week_offset) with n_users, cohort_size, retention.
    */
  def weeklyRetention(events: DataFrame, userCol: String = "user_id"): DataFrame = {
    // `uw` feeds both the cohort min and the join, and `counts` feeds both
    // the size lookup and the final join: whether those shared exchanges
    // REUSE or re-execute is timing-dependent under concurrent stage
    // scheduling (observed: the same commit's shuffle-byte counters differ
    // 0.64x run-to-run with identical rows), so both reuse boundaries are
    // PINNED with localCheckpoint — uw is 2 longs per (user, week) pair and
    // counts is one row per (cohort, offset) cell, so the materialization
    // is always cheap and the byte counters become load-invariant facts.
    val uw = events
      .select(col(userCol).as("u"),
        graft.ext.ExactMath.floorDiv(
          graft.streaming.Sessions.nsToUs(col("ts")), lit(WeekUs)).as("week"))
      .filter(col("u").isNotNull)
      .distinct()
      .localCheckpoint()
    val cohorts = uw.groupBy(col("u")).agg(min(col("week")).as("cohort_week"))
    val counts = uw.join(cohorts, Seq("u"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
      .localCheckpoint()
    val sizes = counts.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    counts.join(broadcast(sizes), Seq("cohort_week"))
      .withColumn("retention",
        col("n_users").cast("double") / col("cohort_size").cast("double"))
      .select("cohort_week", "week_offset", "n_users", "cohort_size", "retention")
  }
}
