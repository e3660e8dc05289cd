package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class GapWatchSpec extends SparkSpec {

  test("closed gaps match batch semantics; silence alerts once via timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long)]
    val df = source.toDF().toDF("user_id", "ts")
    // +1 min epoch offset: events AT epoch 0 are late vs the initial watermark
    def ns(min: Long) = (min + 1) * 60L * 1000000000L
    val q = GapWatch.watch(spark, df, minGapMinutes = 60).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("gapwatch_test").start()
    try {
      // user 1: events at 0 and 90 min → one closed 90-min gap
      source.addData((1L, ns(0)), (1L, ns(90)))
      q.processAllAvailable()
      var rows = spark.table("gapwatch_test").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Long]("userId") === 1L)
      assert(!rows.head.getAs[Boolean]("open"))
      assert(rows.head.getAs[Long]("gapUs") === 90L * 60 * 1000000)
      assert(rows.head.getAs[Long]("gapStartUs") === ns(0) / 1000)

      // a straggler at 30 min (before the seen max) must NOT create a
      // retroactive gap
      source.addData((1L, ns(30)))
      q.processAllAvailable()
      assert(spark.table("gapwatch_test").collect().length === 1)

      // user 2 advances the watermark far past user 1's last+gap: the
      // ongoing silence for user 1 fires ONE open alert
      source.addData((2L, ns(600)))
      q.processAllAvailable()
      source.addData((2L, ns(601))) // extra batch so the timeout fires
      q.processAllAvailable()
      rows = spark.table("gapwatch_test").collect()
      val open = rows.filter(_.getAs[Boolean]("open"))
      assert(open.length === 1)
      assert(open.head.getAs[Long]("userId") === 1L)
      assert(open.head.getAs[Long]("gapStartUs") === ns(90) / 1000)
      assert(open.head.getAs[Long]("gapEndUs") === -1L)

      // further watermark advance does NOT re-alert the same silence
      source.addData((2L, ns(1300)))
      q.processAllAvailable()
      source.addData((2L, ns(1301)))
      q.processAllAvailable()
      assert(spark.table("gapwatch_test").collect()
        .count(_.getAs[Boolean]("open")) === 1)

      // user 1 recovers at 2000 min: the closed row follows the alert
      source.addData((1L, ns(2000)))
      q.processAllAvailable()
      val closed1 = spark.table("gapwatch_test").collect()
        .filter(r => r.getAs[Long]("userId") == 1L && !r.getAs[Boolean]("open"))
      assert(closed1.length === 2)
      assert(closed1.map(_.getAs[Long]("gapEndUs")).contains(ns(2000) / 1000))
    } finally q.stop()
  }
}
