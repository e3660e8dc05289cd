package graft.state

import graft.core.TableMeta
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-processing state + relationship cache (SURVEY §2.8/S9/S10,
  * §4) — the reference's IncrementalProcessor (incremental_processor
  * .py:31-136) and RelationshipCache (relationship_cache.py:36-114)
  * re-expressed as keyed parquet state tables with idempotent last-writer-
  * wins upserts (SURVEY §7.4.5), instead of mutable JSON files.
  *
  * Table-level change detection is the catalog analog of partition pruning:
  * an anti-join of current schema checksums against stored state yields the
  * work list; unchanged tables short-circuit to their cached relationships.
  */
object IncrementalState {

  /** F5 — canonical schema string for one table: columns in schema order as
    * `name:type:req|opt`, prefixed by the table name. Stable across runs and
    * engines; its md5 is the change-detection checksum
    * (incremental_processor.py:79-100).
    */
  def canonicalSchema(t: TableMeta): String =
    t.tableName + "|" + t.columns
      .sortBy(_.ordinal)
      .map { c =>
        val tpe = if (c.isArray) s"array<${c.dataType}>" else c.dataType
        s"${c.name}:$tpe:${if (c.nullable) "opt" else "req"}"
      }
      .mkString(",")

  /** Current checksums as a DataFrame (table_name, schema_hash) — computed
    * with the engine's md5 so it can run distributed over a huge catalog.
    */
  def schemaChecksums(catalog: Dataset[TableMeta]): DataFrame = {
    val spark = catalog.sparkSession
    import spark.implicits._
    catalog
      .map(t => (t.tableName, canonicalSchema(t)))
      .toDF("table_name", "canonical_schema")
      .select(col("table_name"), md5(col("canonical_schema")).as("schema_hash"))
  }

  /** Load persisted state; empty-schema DataFrame when absent. */
  def loadState(spark: SparkSession, statePath: String): DataFrame =
    if (new java.io.File(statePath).exists()) spark.read.parquet(statePath)
    else {
      import spark.implicits._
      Seq.empty[(String, String, Long)].toDF("table_name", "schema_hash", "processed_at_ms")
    }

  /** Changed-or-new tables: current checksums anti-joined against state on
    * (table_name, schema_hash) — the incremental gate
    * (incremental_processor.py:116-136).
    */
  def tablesToProcess(current: DataFrame, state: DataFrame): DataFrame =
    current.join(
      state.select("table_name", "schema_hash"),
      Seq("table_name", "schema_hash"), "left_anti")

  /** A8 — stats over the incremental state + relationship graph
    * (incremental_processor.py:182-204's `get_relationship_stats`), as one
    * summary row: processed-table count, last-processed watermark, total
    * relationships, and the per-type breakdown flattened to a deterministic
    * `type:count` list (the reference returns a dict; a sorted string is the
    * engine-portable row form). Both inputs are catalog-scale, but every
    * aggregate here is a map-side-combined single pass, so the same code is
    * correct over a million-table state.
    */
  def relationshipStats(state: DataFrame, relationships: DataFrame): DataFrame = {
    val stateAgg = state.agg(
      count(lit(1)).as("processed_tables"),
      max(col("processed_at_ms")).as("last_processed_at_ms"))
    val typeCounts = relationships
      .groupBy(col("relationship_type")).agg(count(lit(1)).as("n"))
    val relAgg = typeCounts.agg(
      coalesce(sum(col("n")), lit(0L)).as("total_relationships"),
      count(lit(1)).as("n_relationship_types"),
      concat_ws(",",
        sort_array(collect_list(concat_ws(":", col("relationship_type"), col("n")))))
        .as("relationship_types"))
    stateAgg.crossJoin(relAgg)
  }

  /** Upsert processed tables into state (last writer wins per table). */
  def saveState(
      current: DataFrame, prior: DataFrame, statePath: String, nowMs: Long): Unit = {
    val merged = current
      .withColumn("processed_at_ms", lit(nowMs))
      .unionByName(prior.select("table_name", "schema_hash", "processed_at_ms"))
    val w = Window.partitionBy("table_name").orderBy(col("processed_at_ms").desc)
    val latest = merged
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
    // state tables are small (one row per table): single-file rewrite is the
    // idiomatic durable form; at catalog scale this would be a Delta upsert.
    val tmp = statePath + ".tmp"
    latest.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new java.io.File(statePath)
    if (target.exists()) org.apache.commons.io.FileUtils.deleteDirectory(target)
    new java.io.File(tmp).renameTo(target)
  }
}

/** Cross-run relationship cache keyed by table pair with a TTL
  * (relationship_cache.py:28: 24 h default), as a keyed parquet table:
  * `get` = TTL filter + pair lookup, `put` = last-writer-wins upsert.
  */
object RelationshipCache {
  val DefaultTtlMs: Long = 24L * 3600 * 1000

  def load(spark: SparkSession, path: String): DataFrame =
    if (new java.io.File(path).exists()) spark.read.parquet(path)
    else {
      import spark.implicits._
      Seq.empty[(String, String, String, String, String, Double, String, Boolean, Long)]
        .toDF("source_table", "source_column", "target_table", "target_column",
          "relationship_type", "confidence", "detection_method", "is_custom", "cached_at_ms")
    }

  /** Fresh cached relationships for the given pairs (TTL-filtered). */
  def get(cache: DataFrame, pairs: DataFrame, nowMs: Long,
      ttlMs: Long = DefaultTtlMs): DataFrame =
    cache
      .filter(col("cached_at_ms") >= nowMs - ttlMs)
      .join(pairs, Seq("source_table", "target_table"), "left_semi")

  /** A8 — cache statistics (relationship_cache.py:142-156's
    * `get_cache_stats`): entry count split into fresh vs TTL-expired at
    * `nowMs`, plus the TTL itself — one aggregation pass over the cache
    * table.
    */
  def stats(cache: DataFrame, nowMs: Long, ttlMs: Long = DefaultTtlMs): DataFrame =
    cache.agg(
      count(lit(1)).as("n_cache_entries"),
      coalesce(sum(when(col("cached_at_ms") >= nowMs - ttlMs, 1L).otherwise(0L)), lit(0L))
        .as("n_cache_fresh"),
      coalesce(sum(when(col("cached_at_ms") < nowMs - ttlMs, 1L).otherwise(0L)), lit(0L))
        .as("n_cache_expired"))
      .withColumn("cache_ttl_hours", lit(ttlMs / (3600L * 1000)))

  /** Upsert: newest entry per edge wins; stale rows (TTL-expired) dropped. */
  def put(cache: DataFrame, fresh: DataFrame, path: String, nowMs: Long,
      ttlMs: Long = DefaultTtlMs): Unit = {
    val merged = fresh.withColumn("cached_at_ms", lit(nowMs))
      .unionByName(cache)
      .filter(col("cached_at_ms") >= nowMs - ttlMs)
    val w = Window
      .partitionBy("source_table", "source_column", "target_table", "target_column")
      .orderBy(col("cached_at_ms").desc)
    val latest = merged.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
    val tmp = path + ".tmp"
    latest.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new java.io.File(path)
    if (target.exists()) org.apache.commons.io.FileUtils.deleteDirectory(target)
    new java.io.File(tmp).renameTo(target)
  }
}
