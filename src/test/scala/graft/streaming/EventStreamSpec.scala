package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {

  test("streaming hourly aggregation equals the batch result on the same files") {
    val stream = EventStream.readEvents(spark, sf0001)
    val q = EventStream.runToMemory(EventStream.hourlyAggStream(stream), "hourly_test")
    try {
      val streamed = spark.table("hourly_test")
      val batch = Sessions.hourlyAgg(Tables.events(spark, sf0001))
      // same (hour, type) keys and counts
      val s = streamed.select("hour", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
      val b = batch.select("hour", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
      assert(s === b)
      assert(s.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionization emits per-user session summaries") {
    import spark.implicits._
    val events = Tables.events(spark, sf0001)
    val out = EventStream.sessionizeStream(spark, events)
    // batch execution of the stateful operator over a bounded Dataset
    val rows = out.collect()
    assert(rows.nonEmpty)
    val users = rows.map(_.getAs[Long]("userId")).toSet
    assert(users.size === rows.length) // one state row per user
    assert(rows.forall(r => r.getAs[Long]("nEvents") >= 1))
  }
}
