package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode

/** transformWithState sessionizer (TwsSessions): proves the Spark-4
  * arbitrary-state rewrite is behavior-identical to the
  * flatMapGroupsWithState original on the same scripted input, that the
  * explicit timer is re-armed (old one deleted) when a session extends,
  * and that the state actually lives in RocksDB (transformWithState's
  * required provider).
  */
class TwsSessionsSpec extends SparkSpec {

  private def withRocksDb[A](body: => A): A =
    StateBackend.using(spark, StateBackend.RocksDb)(body)

  // +1 min epoch offset: an event AT the initial watermark (epoch 0)
  // would be dropped as late
  private def ns(min: Long) = (min + 1) * 60L * 1000000000L

  /** Run the scripted batches through a session stream builder and return
    * the final (userId, startUs, endUs, n) set.
    */
  private def runScript(
      name: String, build: DataFrame => DataFrame,
      script: Seq[Seq[(Long, Long)]]): Set[(Long, Long, Long, Long)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long)]
    val df = source.toDF().toDF("user_id", "ts")
    val q = build(df).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      script.foreach { batch =>
        source.addData(batch: _*)
        q.processAllAvailable()
      }
      spark.table(name).collect().map(r => (
        r.getAs[Long]("userId"), r.getAs[Long]("sessionStartUs"),
        r.getAs[Long]("sessionEndUs"), r.getAs[Long]("nEvents"))).toSet
    } finally q.stop()
  }

  // the EventStreamSpec scenario plus an idle close and a straggler:
  // user 1 bursts, gap-closes, straggles; user 2 advances the watermark
  private val script: Seq[Seq[(Long, Long)]] = Seq(
    Seq((1L, ns(0)), (1L, ns(10)), (1L, ns(130))),
    Seq((1L, ns(125))), // out-of-order straggler within gap of the open 130
    Seq((2L, ns(600))), // advances watermark far past user 1's end+gap
    Seq((2L, ns(601)))) // one more batch so the event-time timer fires

  test("transformWithState sessions == flatMapGroupsWithState sessions") {
    val tws = withRocksDb {
      runScript("tws_sessions",
        df => TwsSessions.closedSessionsTws(spark, df, gapMinutes = 30), script)
    }
    // legacy path runs on the default provider — same rows either way
    val legacy = runScript("fmgws_sessions",
      df => EventStream.closedSessionsStream(spark, df, gapMinutes = 30), script)
    assert(tws === legacy, s"tws=$tws legacy=$legacy")
    // and the scenario's known shape: user 1's burst session (2 events,
    // 0..10 min) plus the straggler-merged idle session at 130
    assert(tws.contains((1L, ns(0) / 1000, ns(10) / 1000, 2L)))
    assert(tws.contains((1L, ns(130) / 1000, ns(130) / 1000, 2L)))
  }

  test("session extension re-arms the close timer instead of firing twice") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val source = MemoryStream[(Long, Long)]
      val df = source.toDF().toDF("user_id", "ts")
      val q = TwsSessions.closedSessionsTws(spark, df, gapMinutes = 30).writeStream
        .outputMode(OutputMode.Append)
        .format("memory").queryName("tws_rearm").start()
      try {
        // extend the session across batches: each extension must delete
        // the previous timer, so the idle close fires ONCE with the final
        // boundaries, never with an intermediate end
        source.addData((1L, ns(0)))
        q.processAllAvailable()
        source.addData((1L, ns(20)))
        q.processAllAvailable()
        source.addData((1L, ns(40)))
        q.processAllAvailable()
        // watermark mover (delay 2h): push far past 40 + 30 min
        source.addData((9L, ns(600)))
        q.processAllAvailable()
        source.addData((9L, ns(601)))
        q.processAllAvailable()
        val u1 = spark.table("tws_rearm").collect()
          .filter(_.getAs[Long]("userId") == 1L)
        assert(u1.length === 1, s"expected one close, got ${u1.mkString(";")}")
        assert(u1.head.getAs[Long]("sessionStartUs") === ns(0) / 1000)
        assert(u1.head.getAs[Long]("sessionEndUs") === ns(40) / 1000)
        assert(u1.head.getAs[Long]("nEvents") === 3L)
        // the state provider is really RocksDB (transformWithState requires
        // it; this asserts the metric so a silent fallback fails the test)
        assert(q.recentProgress.flatMap(_.stateOperators).exists(
          _.customMetrics.containsKey("rocksdbGetCount")),
          "transformWithState state operator did not report RocksDB metrics")
      } finally q.stop()
    }
  }
}
