package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class CdcStreamSpec extends SparkSpec {

  test("latestState: latest-wins under out-of-order delivery, tombstones, batch convergence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Long, String, Double)]
    val df = source.toDF().toDF("key", "ts_us", "seq", "op", "value")
    val q = CdcStream.latestState(spark, df).writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName("cdc_test").start()
    try {
      def latest() = spark.table("cdc_test").collect()
        .groupBy(_.getAs[Long]("key"))
        .map { case (k, rows) => k -> rows.maxBy(_.getAs[Long]("nOps")) }

      // batch 1: two upserts for key 1, one for key 2
      source.addData((1L, 10L, 1L, "U", 1.0), (1L, 20L, 2L, "U", 2.0), (2L, 10L, 3L, "U", 3.0))
      q.processAllAvailable()
      var st = latest()
      assert(st(1L).getAs[Double]("value") === 2.0 && !st(1L).getAs[Boolean]("deleted"))
      assert(st(1L).getAs[Long]("nOps") === 2L)

      // batch 2: STRAGGLER for key 1 (older ts) — value must NOT regress
      source.addData((1L, 15L, 4L, "U", 99.0))
      q.processAllAvailable()
      st = latest()
      assert(st(1L).getAs[Double]("value") === 2.0)
      assert(st(1L).getAs[Long]("nOps") === 3L)

      // batch 3: delete key 2 → tombstone, not silence
      source.addData((2L, 20L, 5L, "D", 0.0))
      q.processAllAvailable()
      st = latest()
      assert(st(2L).getAs[Boolean]("deleted"))

      // batch 4: post-delete upsert revives key 2
      source.addData((2L, 30L, 6L, "U", 6.0))
      q.processAllAvailable()
      st = latest()
      assert(!st(2L).getAs[Boolean]("deleted") && st(2L).getAs[Double]("value") === 6.0)

      // convergence: the final state equals the batch operator over the full log
      val log = Seq(
        (1L, 10L, 1L, "U", 1.0), (1L, 20L, 2L, "U", 2.0), (2L, 10L, 3L, "U", 3.0),
        (1L, 15L, 4L, "U", 99.0), (2L, 20L, 5L, "D", 0.0), (2L, 30L, 6L, "U", 6.0)
      ).toDF("key", "ts_us", "seq", "op", "value")
      val batch = graft.ops.Cdc.latestSnapshot(log, "key", "ts_us", "seq", "op", Seq("value"))
        .collect().map(r => r.getAs[Long]("key") ->
          ((r.getAs[Double]("value"), r.getAs[Long]("last_ts"), r.getAs[Long]("n_ops")))).toMap
      val live = latest().filter(!_._2.getAs[Boolean]("deleted"))
        .map { case (k, r) =>
          k -> ((r.getAs[Double]("value"), r.getAs[Long]("lastTsUs"), r.getAs[Long]("nOps"))) }
      assert(live === batch)
    } finally q.stop()
  }
}
