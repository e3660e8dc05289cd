package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incrementally maintained rollups (materialized-view refresh): keep the
  * PARTIAL aggregate state (count + decimal sum per key) instead of the
  * finished report, and fold each new batch in with the same merge that
  * combined the shards — associative, commutative, and exact (decimal
  * accumulation, so refresh order can't drift the totals).
  *
  * Scale design: the state table has one row per key (report-scale, not
  * data-scale); refreshing a 100 TB-fed rollup touches only the NEW batch —
  * one map-side-combined shuffle of (key, cnt, sum) partials — plus a
  * state-sized merge groupBy. Re-aggregating history is never needed, and
  * `merge(state, partial(batch)) == partial(history ∪ batch)` is the spec'd
  * invariant. Means/averages derive at read time from cnt+sum (never stored
  * — stored ratios don't merge).
  */
object IncrementalAgg {

  private val D = DecimalType(18, 4)

  /** Partial state of `df` grouped by `keys`: row count and the exact
    * decimal sum of `valueCol`. The same function aggregates a shard, a
    * batch, or the full history — state shape is closed under [[merge]].
    */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(D)).cast(D).as("total"))

  /** Fold partial states together (any number, any order — same result).
    * Output shape equals input shape, so merged state feeds the next merge.
    */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        // coalesce keeps cnt non-nullable, so merged state has EXACTLY the
        // shape partial() emits (schema-closed under re-merge)
        coalesce(sum(col("cnt")), lit(0L)).cast("long").as("cnt"),
        sum(col("total")).cast(D).as("total"))

  /** Read-time report over a state table: derived mean, double-typed sum.
    * The mean divides DOUBLES (exact decimal → double, then one IEEE
    * divide) — decimal division rounds at engine-specific scales and would
    * drift a cross-engine oracle.
    */
  def report(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("cnt"),
        col("total").cast("double").as("total"),
        (col("total").cast("double") / col("cnt").cast("double")).as("mean")): _*)
}
