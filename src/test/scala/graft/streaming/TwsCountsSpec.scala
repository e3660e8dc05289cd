package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

/** transformWithState MapState counts (TwsCounts): the incremental
  * per-(user, type) totals must equal the batch groupBy count on the
  * same rows, accumulate correctly across micro-batches, and live in
  * RocksDB.
  */
class TwsCountsSpec extends SparkSpec {

  test("incremental MapState totals equal the batch groupBy counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateBackend.using(spark, StateBackend.RocksDb) {
      val source = MemoryStream[(Long, String)]
      val df = source.toDF().toDF("user_id", "event_type")
      val q = TwsCounts.typeCountsTws(spark, df).writeStream
        .outputMode(OutputMode.Update)
        .format("memory").queryName("tws_counts").start()
      try {
        val batch1 = Seq((1L, "click"), (1L, "click"), (1L, "view"),
          (2L, "click"))
        val batch2 = Seq((1L, "click"), (2L, "purchase"), (2L, "click"),
          (2L, "click"))
        source.addData(batch1: _*)
        q.processAllAvailable()
        // first batch: counts are the batch's own tallies
        val after1 = spark.table("tws_counts").collect()
          .map(r => (r.getAs[Long]("userId"), r.getAs[String]("eventType")) ->
            r.getAs[Long]("n")).toMap
        assert(after1 === Map((1L, "click") -> 2L, (1L, "view") -> 1L,
          (2L, "click") -> 1L))
        source.addData(batch2: _*)
        q.processAllAvailable()
        // LAST emission per key is the running total — must equal the
        // batch groupBy count over all rows delivered so far
        val all = spark.table("tws_counts").collect()
          .map(r => ((r.getAs[Long]("userId"), r.getAs[String]("eventType")),
            r.getAs[Long]("n")))
        val finalCounts = all.groupBy(_._1).view
          .mapValues(_.map(_._2).max).toMap // counts only grow
        val expected = (batch1 ++ batch2).groupBy(identity).view
          .mapValues(_.size.toLong).toMap
        assert(finalCounts === expected)
        // cross-batch accumulation really happened (not a reset)
        assert(finalCounts((1L, "click")) === 3L)
        assert(finalCounts((2L, "click")) === 3L)
        // the state provider is really RocksDB
        assert(q.recentProgress.flatMap(_.stateOperators).exists(
          _.customMetrics.containsKey("rocksdbGetCount")),
          "transformWithState state operator did not report RocksDB metrics")
      } finally q.stop()
    }
  }

  test("initial-state bootstrap: seeded totals accumulate on top of the batch table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateBackend.using(spark, StateBackend.RocksDb) {
      // the batch-maintained table the streaming query cuts over from
      val initial = Seq((1L, "click", 10L), (1L, "view", 5L),
        (3L, "purchase", 2L)).toDF("user_id", "event_type", "n")
      val source = MemoryStream[(Long, String)]
      val df = source.toDF().toDF("user_id", "event_type")
      val q = TwsCounts.typeCountsTwsSeeded(spark, df, initial).writeStream
        .outputMode(OutputMode.Update)
        .format("memory").queryName("tws_seeded").start()
      try {
        source.addData((1L, "click"), (2L, "view"), (1L, "search"))
        q.processAllAvailable()
        val got = spark.table("tws_seeded").collect()
          .map(r => (r.getAs[Long]("userId"), r.getAs[String]("eventType")) ->
            r.getAs[Long]("n")).toMap
        // seeded key accumulates ON TOP of the bootstrap value; unseeded
        // keys start at zero; untouched seeded keys (1/view, 3/purchase)
        // emit nothing this batch but their state persists
        assert(got === Map((1L, "click") -> 11L, (2L, "view") -> 1L,
          (1L, "search") -> 1L))
        source.addData((3L, "purchase"))
        q.processAllAvailable()
        val got2 = spark.table("tws_seeded").collect()
          .map(r => (r.getAs[Long]("userId"), r.getAs[String]("eventType")) ->
            r.getAs[Long]("n")).toMap
        assert(got2((3L, "purchase")) === 3L,
          "a seeded key first touched in batch 2 must still see its bootstrap")
      } finally q.stop()
    }
  }
}
