package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-appropriate defaults.
  *
  * Local testing runs `local[32]`; the same configuration carries to a real
  * cluster where `master` comes from spark-submit. AQE stays on so join
  * strategies and partition counts re-plan at runtime (skew joins, broadcast
  * demotion/promotion) — essential at 100 TB where static estimates are wrong.
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Catalyst extensions: approx-distinct rewrite rule (off unless
      // spark.graft.approxDistinct.enabled) + graft_dot SQL function.
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // testdata events.ts is parquet timestamp[ns], which Spark refuses by
      // default; read as long (nanos) and convert explicitly where needed.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests/CLI. */
  def local(cores: Int = 32): SparkSession =
    builder().master(s"local[$cores]").getOrCreate()
}
