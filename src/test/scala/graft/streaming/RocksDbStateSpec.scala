package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.OutputMode

/** The same stateful streaming operators, under the RocksDB state store
  * provider — the backend a 100 TB deployment runs (state spills to local
  * disk instead of living on the JVM heap, so watermark-bounded state can
  * exceed executor memory). The engine's streaming code is
  * provider-agnostic by construction; this spec PROVES it by re-running
  * the dedup and session-close paths with the provider swapped in.
  */
class RocksDbStateSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("dropDuplicatesWithinWatermark state lives in RocksDB") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val source = MemoryStream[(Long, Long, Long, String, String)]
      val df = source.toDF().toDF("event_id", "ts", "user_id", "event_type", "props")
        .withColumn("value", lit(1.0))
      val q = EventStream.dedupStream(df).writeStream
        .outputMode(OutputMode.Append)
        .format("memory").queryName("rocksdb_dedup").start()
      try {
        def ns(hour: Long) = (100 + hour) * 3600L * 1000000000L
        source.addData(
          (1L, ns(0), 7L, "click", "{}"),
          (2L, ns(0), 7L, "click", "{}"),
          (3L, ns(0), 8L, "view", "{}"))
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.asScala.exists(
          _.customMetrics.containsKey("rocksdbGetCount")),
          "state operator did not report RocksDB metrics — provider not in effect")
        val kept = spark.table("rocksdb_dedup").collect()
        assert(kept.length === 2)
        assert(kept.map(_.getAs[Long]("user_id")).toSet === Set(7L, 8L))
      } finally q.stop()
    }
  }

  test("mapGroupsWithState sessions close identically under RocksDB") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val source = MemoryStream[(Long, Long)]
      val df = source.toDF().toDF("user_id", "ts")
      val q = EventStream.closedSessionsStream(spark, df, gapMinutes = 30).writeStream
        .outputMode(OutputMode.Append)
        .format("memory").queryName("rocksdb_sessions").start()
      try {
        def ns(min: Long) = (min + 1) * 60L * 1000000000L
        source.addData((1L, ns(0)), (1L, ns(10)), (1L, ns(130)))
        q.processAllAvailable()
        val closed = spark.table("rocksdb_sessions").collect()
        assert(closed.length === 1)
        assert(closed.head.getAs[Long]("nEvents") === 2L)
      } finally q.stop()
    }
  }

  private implicit class JMapOps(
      arr: Array[org.apache.spark.sql.streaming.StateOperatorProgress]) {
    def asScala: Seq[org.apache.spark.sql.streaming.StateOperatorProgress] = arr.toSeq
  }
}
