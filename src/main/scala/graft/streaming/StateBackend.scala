package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store backend selection. The default HDFS-backed store
  * keeps every key's state on the JVM heap — fine for tests and bounded
  * keyspaces, a memory wall for the state-heavy operators (per-user
  * sessions, watermark-window dedup) at production fan-in. RocksDB (bundled
  * with Spark) spills state to local disk with an in-memory cache, so state
  * size is bounded by disk, not executor heap.
  *
  * The provider is a SESSION conf read at query start and pinned into the
  * query's checkpoint; the stateful builders (`EventStream.dedupStream`,
  * `sessionizeStream`, `closedSessionsStream`, `GapWatch.watch`) take it as
  * an opt-in parameter so a caller selects the backend where the query is
  * built instead of having to know the conf key.
  */
object StateBackend {
  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Fully-qualified provider class of Spark's bundled RocksDB store. */
  val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Apply an opt-in backend choice to the session (None = leave as-is). */
  private[streaming] def apply(spark: SparkSession, backend: Option[String]): Unit =
    backend.foreach(p => spark.conf.set(ProviderKey, p))
}
