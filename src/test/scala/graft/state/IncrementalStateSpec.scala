package graft.state

import java.nio.file.Files

import graft.SparkSpec
import graft.catalog.ParquetCatalog
import org.apache.spark.sql.functions.col

class IncrementalStateSpec extends SparkSpec {

  test("checksum change detection: only changed tables reprocess") {
    val catalog = ParquetCatalog.catalog(spark, sf0001)
    val current = IncrementalState.schemaChecksums(catalog).cache()
    val dir = Files.createTempDirectory("graft_state").toString
    val statePath = s"$dir/state.parquet"

    // first run: everything is new
    val prior = IncrementalState.loadState(spark, statePath)
    assert(IncrementalState.tablesToProcess(current, prior).count() === 10)
    IncrementalState.saveState(current, prior, statePath, nowMs = 1000L)

    // second run, unchanged: nothing to do (the reference's early-exit,
    // enhanced_relationship_detector.py:73-75)
    val state2 = IncrementalState.loadState(spark, statePath)
    assert(IncrementalState.tablesToProcess(current, state2).count() === 0)

    // simulate one schema change: perturb a hash
    import org.apache.spark.sql.functions._
    val mutated = current.withColumn(
      "schema_hash",
      when(col("table_name") === "orders", lit("deadbeef")).otherwise(col("schema_hash")))
    assert(IncrementalState.tablesToProcess(mutated, state2).count() === 1)

    // upsert keeps one row per table, newest processed_at
    IncrementalState.saveState(mutated, state2, statePath, nowMs = 2000L)
    val state3 = IncrementalState.loadState(spark, statePath)
    assert(state3.count() === 10)
    assert(state3.filter(col("table_name") === "orders")
      .head.getAs[String]("schema_hash") === "deadbeef")
  }

  test("relationship cache: TTL filters stale entries, upsert keeps newest") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cache").toString
    val path = s"$dir/cache.parquet"
    val rel = Seq(("a", "x", "b", "y", "many_to_one", 0.9, "exact_match", false))
      .toDF("source_table", "source_column", "target_table", "target_column",
        "relationship_type", "confidence", "detection_method", "is_custom")

    RelationshipCache.put(RelationshipCache.load(spark, path), rel, path, nowMs = 1000L)
    val pairs = Seq(("a", "b")).toDF("source_table", "target_table")

    val fresh = RelationshipCache.get(RelationshipCache.load(spark, path), pairs, nowMs = 2000L)
    assert(fresh.count() === 1)

    // beyond TTL: stale
    val stale = RelationshipCache.get(
      RelationshipCache.load(spark, path), pairs,
      nowMs = 1000L + RelationshipCache.DefaultTtlMs + 1)
    assert(stale.count() === 0)

    // upsert with higher confidence at a later time wins
    val rel2 = rel.withColumn("confidence", org.apache.spark.sql.functions.lit(1.0))
    RelationshipCache.put(RelationshipCache.load(spark, path), rel2, path, nowMs = 3000L)
    val latest = RelationshipCache.get(RelationshipCache.load(spark, path), pairs, nowMs = 4000L)
    assert(latest.head.getAs[Double]("confidence") === 1.0)
  }

  test("canonical schema covers arrays and nullability") {
    val cat = ParquetCatalog.catalog(spark, sf0001).collect()
    val emb = cat.find(_.tableName == "embeddings").get
    assert(IncrementalState.canonicalSchema(emb) ===
      "embeddings|vec_id:bigint:opt,embedding:array<float>:opt,label:integer:opt")
  }
}
