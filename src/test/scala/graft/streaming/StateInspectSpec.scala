package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** State data source reader (StateInspect): a checkpoint's state is
  * readable OFFLINE — the operator catalog via `state-metadata`, exact
  * per-key contents via `statestore`, and transformWithState variables
  * by name — without replaying any input.
  */
class StateInspectSpec extends SparkSpec {

  test("aggregation state: checkpointed counts equal the query's output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_state_inspect").toString
    StateBackend.using(spark, StateBackend.RocksDb) {
      val source = MemoryStream[(Long, String)]
      val counts = source.toDF().toDF("user_id", "event_type")
        .groupBy("user_id").count()
      val q = counts.writeStream
        .outputMode(OutputMode.Complete)
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("si_counts").start()
      try {
        source.addData((1L, "a"), (1L, "b"), (2L, "a"))
        q.processAllAvailable()
        source.addData((2L, "c"), (3L, "a"))
        q.processAllAvailable()
      } finally q.stop()
    }
    // the catalog names the aggregation operator and its batch range
    val meta = StateInspect.operatorMetadata(spark, ckpt).collect()
    assert(meta.length === 1)
    val m = meta.head
    assert(m.getAs[String]("operatorName") === "stateStoreSave")
    assert(m.getAs[Long]("maxBatchId") >= 1L)
    // the store's contents ARE the final counts — read with the query
    // STOPPED, no input replayed
    val state = StateInspect.stateOf(spark, ckpt)
      .select(col("key.user_id").as("user_id"),
        col("value.count").as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n"))
      .toMap
    assert(state === Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("transformWithState: MapState variables are addressable by name") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_state_inspect_tws").toString
    StateBackend.using(spark, StateBackend.RocksDb) {
      val source = MemoryStream[(Long, String)]
      val df = source.toDF().toDF("user_id", "event_type")
      val q = TwsCounts.typeCountsTws(spark, df).writeStream
        .outputMode(OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("si_tws").start()
      try {
        source.addData((1L, "click"), (1L, "click"), (1L, "view"),
          (2L, "click"))
        q.processAllAvailable()
        source.addData((1L, "click"), (2L, "purchase"))
        q.processAllAvailable()
      } finally q.stop()
    }
    // the catalog row is the transformWithState operator
    val meta = StateInspect.operatorMetadata(spark, ckpt).collect()
    assert(meta.exists(
      _.getAs[String]("operatorName") === "transformWithStateExec"))
    // the "counts" MapState, flattened per entry: (grouping key,
    // user_map_key) -> user_map_value — exactly the cross-batch totals
    // the processor accumulated
    val rows = StateInspect.stateOf(spark, ckpt,
      stateVarName = Some("counts")).collect()
    val state = rows.map { r =>
      val key = r.getStruct(r.fieldIndex("key"))
      val userKey = r.getStruct(r.fieldIndex("user_map_key"))
      ((key.getLong(0), userKey.getString(0)),
        r.getStruct(r.fieldIndex("user_map_value")).getLong(0))
    }.toMap
    assert(state === Map(
      (1L, "click") -> 3L, (1L, "view") -> 1L,
      (2L, "click") -> 1L, (2L, "purchase") -> 1L))
  }
}
