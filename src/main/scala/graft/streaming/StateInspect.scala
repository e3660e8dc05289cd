package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline inspection of a streaming query's CHECKPOINTED STATE through
  * Spark's state data source — the operational surface a 100 TB
  * deployment reads when a stateful pipeline misbehaves: what operators
  * hold state, how many batches they have committed, and the exact
  * per-key contents of any store, WITHOUT touching the running query or
  * replaying its input.
  *
  * Two public formats compose here:
  *
  *  - `state-metadata`: one row per stateful operator in the checkpoint
  *    (operator id/name, store name, partition count, committed batch
  *    range) — the catalog of what is inspectable.
  *  - `statestore`: the keys and values of one store at the latest (or
  *    a chosen) committed batch. For `transformWithState` operators the
  *    store is addressed by STATE VARIABLE name (the handle name passed
  *    to `getValueState`/`getMapState`/...), because one operator holds
  *    many independently-typed variables.
  *
  * Reading state this way is a BATCH scan of the checkpoint files —
  * partition-parallel, no shuffle — so inspecting a terabyte-state
  * pipeline costs one pass over its RocksDB snapshots, not a replay of
  * months of input.
  */
object StateInspect {

  /** The stateful-operator catalog of a checkpoint: operator ids/names,
    * state store names, partition counts, and the committed batch range
    * each store covers.
    */
  def operatorMetadata(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("state-metadata").load(checkpoint)

  /** The contents of one state store at the last committed batch (or at
    * `batchId`). `stateVarName` addresses a `transformWithState`
    * variable; classic stateful operators (aggregations, dedup, joins)
    * have a single default store and need no name.
    */
  def stateOf(spark: SparkSession, checkpoint: String,
      stateVarName: Option[String] = None,
      batchId: Option[Long] = None): DataFrame = {
    var r = spark.read.format("statestore")
    stateVarName.foreach(v => r = r.option("stateVarName", v))
    batchId.foreach(b => r = r.option("batchId", b))
    r.load(checkpoint)
  }
}
