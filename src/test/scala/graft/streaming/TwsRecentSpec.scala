package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

/** transformWithState ListState last-N + TTLConfig eviction (TwsRecent):
  * the incremental window must equal the batch tail-N on scripted input
  * (including through the amortized trim), and a short TTL must really
  * evict across a wall-clock gap that a long TTL survives.
  */
class TwsRecentSpec extends SparkSpec {

  test("ListState last-N equals the batch tail-N, through the trim path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateBackend.using(spark, StateBackend.RocksDb) {
      val source = MemoryStream[(Long, Long, String)]
      val df = source.toDF().toDF("user_id", "seq", "item")
      // n=3, trimSlack=2: the stored list trims once a key holds > 6
      val q = TwsRecent.lastNTws(spark, df, n = 3, trimSlack = 2)
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("tws_lastn").start()
      try {
        var seq = 0L
        def batch(events: (Long, String)*): Unit = {
          source.addData(events.map { case (u, it) => seq += 1; (u, seq, it) }: _*)
          q.processAllAvailable()
        }
        def latest(): Map[Long, String] =
          spark.table("tws_lastn").collect()
            .map(r => (r.getAs[Long]("userId"), r.getAs[String]("recent")))
            .zipWithIndex
            .groupBy(_._1._1).view
            .mapValues(_.maxBy(_._2)._1._2).toMap

        batch(1L -> "a", 1L -> "b", 2L -> "x")
        assert(latest() === Map(1L -> "a,b", 2L -> "x"))
        batch(1L -> "c", 1L -> "d")
        // window is the TAIL 3 in arrival order
        assert(latest()(1L) === "b,c,d")
        // push user 1 past the 2*3 slack: 4 stored + 4 new = 8 > 6, so
        // this batch takes the amortized-trim path; the window must be
        // indistinguishable from the untrimmed computation
        batch(1L -> "e", 1L -> "f", 1L -> "g", 1L -> "h")
        assert(latest()(1L) === "f,g,h")
        // and appends after the trim still see the trimmed list
        batch(1L -> "i")
        assert(latest()(1L) === "g,h,i")
        assert(latest()(2L) === "x", "untouched keys keep their window")
        // the state provider is really RocksDB
        assert(q.recentProgress.flatMap(_.stateOperators).exists(
          _.customMetrics.containsKey("rocksdbGetCount")),
          "ListState operator did not report RocksDB metrics")
      } finally q.stop()
    }
  }

  test("TTLConfig: a short TTL evicts across a gap a long TTL survives") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    StateBackend.using(spark, StateBackend.RocksDb) {
      // a ProcessingTime-mode query NEVER quiesces: the engine keeps
      // running no-data batches because wall-clock advance alone can
      // expire TTL state, so processAllAvailable/AvailableNow cannot be
      // awaited. The honest harness: leave the query running on a real
      // trigger interval and POLL the sink — the processor only emits
      // on input rows, so the sink stays deterministic.
      def awaitN(table: String, want: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        var seen = Set.empty[Long]
        while (System.nanoTime() < deadline) {
          seen = spark.table(table).collect().map(_.getAs[Long]("n")).toSet
          if (seen.contains(want)) return
          Thread.sleep(50)
        }
        fail(s"$table never showed n=$want (saw $seen)")
      }
      // two identical pipelines, one 300 ms TTL, one 1 hour — the SAME
      // gap separates their batches, so the pair isolates TTL eviction
      val srcS = MemoryStream[(Long, String)]
      val srcL = MemoryStream[(Long, String)]
      val qS = TwsRecent.ttlCountsTws(spark,
        srcS.toDF().toDF("user_id", "event_type"),
        java.time.Duration.ofMillis(300))
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("tws_ttl_s")
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      val qL = TwsRecent.ttlCountsTws(spark,
        srcL.toDF().toDF("user_id", "event_type"),
        java.time.Duration.ofHours(1))
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("tws_ttl_l")
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      try {
        srcS.addData((1L, "click"), (1L, "view"))
        srcL.addData((1L, "click"), (1L, "view"))
        awaitN("tws_ttl_s", 2L)
        awaitN("tws_ttl_l", 2L)
        // the gap: comfortably past 300 ms, nowhere near 1 hour
        Thread.sleep(2000)
        srcS.addData((1L, "click"))
        srcL.addData((1L, "click"))
        awaitN("tws_ttl_l", 3L) // retained: 2 + 1
        awaitN("tws_ttl_s", 1L) // evicted: the counter RESTARTED
        // the short pipeline must never have seen a resumed total
        val shortNs = spark.table("tws_ttl_s").collect()
          .map(_.getAs[Long]("n")).toSet
        assert(!shortNs.contains(3L),
          "a 300 ms TTL resumed across a 2-second gap instead of evicting")
      } finally { qS.stop(); qL.stop() }
    }
  }
}
