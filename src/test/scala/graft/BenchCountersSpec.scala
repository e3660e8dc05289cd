package graft

import org.apache.spark.sql.functions._

/** The bench's load-invariant counters are certification evidence (the
  * committed summary's shuffle/rows numbers are what round-over-round
  * grading falls back to when wall time drifts), so the attribution
  * machinery itself is pinned: job-group keyed task metrics must capture a
  * query's shuffle bytes, and the Observation row count must be exact.
  */
class BenchCountersSpec extends SparkSpec {

  test("job-group attribution captures shuffle bytes; Observation rows are exact") {
    val sc = spark.sparkContext
    val listener = new QueryTaskMetricsListener
    sc.addSparkListener(listener)
    try {
      val group = "bench-counters-spec"
      sc.setJobGroup(group, "spec")
      val obs = org.apache.spark.sql.Observation("bench_counters_spec_rows")
      // a query that MUST shuffle (groupBy over a generated range)
      spark.range(0, 100000)
        .select((col("id") % 97).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .observe(obs, count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      sc.clearJobGroup()
      org.apache.spark.graftshim.ListenerFlush.waitUntilEmpty(sc)
      val rows = obs.get("n").asInstanceOf[Number].longValue()
      assert(rows === 97L, "Observation must count exactly the sink rows")
      val agg = listener.snapshot(group)
      assert(agg.isDefined, "job group must have attributed task metrics")
      assert(agg.get.shuffleWrite > 0L, "the groupBy's shuffle write must be visible")
      assert(agg.get.shuffleRead > 0L, "the groupBy's shuffle read must be visible")
      assert(agg.get.tasks > 0L)
    } finally sc.removeSparkListener(listener)
  }

  test("metrics from other job groups never leak into a query's snapshot") {
    val sc = spark.sparkContext
    val listener = new QueryTaskMetricsListener
    sc.addSparkListener(listener)
    try {
      sc.setJobGroup("group-a", "a")
      spark.range(0, 1000).select((col("id") % 7).as("k"))
        .groupBy("k").count().write.format("noop").mode("overwrite").save()
      sc.clearJobGroup()
      org.apache.spark.graftshim.ListenerFlush.waitUntilEmpty(sc)
      assert(listener.snapshot("group-a").isDefined)
      assert(listener.snapshot("group-b").isEmpty,
        "an unused group must have no metrics")
      listener.reset("group-a")
      assert(listener.snapshot("group-a").isEmpty, "reset must clear the group")
    } finally sc.removeSparkListener(listener)
  }
}
