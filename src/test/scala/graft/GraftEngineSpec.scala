package graft

import java.nio.file.Files

import graft.core.CustomRule
import org.apache.spark.sql.functions._

class GraftEngineSpec extends SparkSpec {

  private lazy val engine = new GraftEngine(
    spark, sf0001,
    customRules = Seq(CustomRule("events", "user_id", "customer", "c_custkey")))

  test("end-to-end: enhanced pipeline boosts all consistent edges to 1.0") {
    val out = engine.enhancedRelationships().collect()
    assert(out.length === 8)
    assert(out.forall(_.getAs[Boolean]("data_validated")))
    assert(out.forall(_.getAs[Double]("adjusted_confidence") === 1.0))
  }

  test("all three render formats produce non-trivial deterministic output") {
    val m1 = engine.renderErd("mermaid")
    assert(m1 === engine.renderErd("mermaid")) // deterministic
    assert(m1.contains("lineitem"))
    assert(engine.renderErd("plantuml").contains("@startuml"))
    assert(engine.renderErd("drawio").contains("<mxfile"))
    intercept[IllegalArgumentException](engine.renderErd("nope"))
  }

  test("data_testing.enabled=false short-circuits: edges pass through untested") {
    val off = new GraftEngine(
      spark, sf0001,
      customRules = Seq(CustomRule("events", "user_id", "customer", "c_custkey")),
      cfg = graft.core.DetectionConfig(dataTestEnabled = false))
    val out = off.enhancedRelationships()
    // no data-test columns were added — the name-detected frame is returned
    assert(!out.columns.contains("data_validated"))
    assert(out.count() === off.relationships.count())
  }

  test("data_testing.sample_size caps endpoint scans as per-table fractions") {
    val sized = new GraftEngine(
      spark, sf0001,
      customRules = Seq(CustomRule("events", "user_id", "customer", "c_custkey")),
      cfg = graft.core.DetectionConfig(dataTestSampleSize = 200))
    val out = sized.enhancedRelationships().collect()
    assert(out.length === 8)
    // sampled testing still validates the consistent sf0.001 edges; with
    // ~200 rows per endpoint the RI margin stays well above the threshold
    assert(out.count(_.getAs[Boolean]("data_validated")) >= 6)
  }

  test("cache TTL binds: fresh cache serves edges, expired cache re-detects") {
    val path = Files.createTempDirectory("graft_ttl").toString + "/rels.parquet"
    val eng = new GraftEngine(
      spark, sf0001,
      customRules = Seq(CustomRule("events", "user_id", "customer", "c_custkey")),
      cfg = graft.core.DetectionConfig(cacheTtlHours = 24))
    val t0 = 1000L * 3600 * 1000
    val first = eng.relationshipsCached(path, nowMs = t0) // cold: detect + put
    assert(first.count() === 8)
    // within TTL: served from the cache file (same edges, cached_at dropped)
    val cached = eng.relationshipsCached(path, nowMs = t0 + 23L * 3600 * 1000)
    assert(cached.collect().toSet === first.collect().toSet)
    // past TTL: the freshness probe finds nothing and re-detection runs
    val expired = eng.relationshipsCached(path, nowMs = t0 + 25L * 3600 * 1000)
    assert(expired.count() === 8)
  }

  test("mixed-age cache (some entries expired) re-detects instead of serving the fresh subset") {
    val path = Files.createTempDirectory("graft_ttl_mixed").toString + "/rels.parquet"
    val ttlMs = 24L * 3600 * 1000
    val eng = new GraftEngine(
      spark, sf0001,
      customRules = Seq(CustomRule("events", "user_id", "customer", "c_custkey")),
      cfg = graft.core.DetectionConfig(cacheTtlHours = 24))
    val t0 = 1000L * 3600 * 1000
    assert(eng.relationshipsCached(path, nowMs = t0).count() === 8)
    // refresh ONE pair 10h later through the public per-pair put API — the
    // file now holds mixed-age rows (1 @ t0+10h, 7 @ t0)
    val cache = graft.state.RelationshipCache.load(spark, path)
    val one = cache.orderBy("source_table", "source_column").limit(1).drop("cached_at_ms")
    graft.state.RelationshipCache.put(cache, one, path, nowMs = t0 + 10L * 3600 * 1000, ttlMs = ttlMs)
    // 30h after t0 the refreshed pair is still fresh but the other 7 are
    // expired: the engine must NOT serve the 1-row fresh subset — it
    // re-detects the full edge set and rewrites the cache wholly fresh
    val now = t0 + 30L * 3600 * 1000
    assert(eng.relationshipsCached(path, nowMs = now).count() === 8)
    val rewritten = graft.state.RelationshipCache.load(spark, path)
    assert(rewritten.count() === 8)
    assert(rewritten.filter(col("cached_at_ms") === now).count() === 8)
  }

  test("performance.cache_enabled=false bypasses the cache entirely") {
    val path = Files.createTempDirectory("graft_nocache").toString + "/rels.parquet"
    val eng = new GraftEngine(
      spark, sf0001,
      customRules = Seq(CustomRule("events", "user_id", "customer", "c_custkey")),
      cfg = graft.core.DetectionConfig(cacheEnabled = false))
    assert(eng.relationshipsCached(path, nowMs = 123L).count() === 8)
    assert(!new java.io.File(path).exists(), "disabled cache must not write a file")
  }

  test("A8 stats: live catalog state + edges, optional cache split") {
    val r = engine.stats(nowMs = 42L).collect().head
    assert(r.getAs[Long]("processed_tables") === 10L)
    assert(r.getAs[Long]("last_processed_at_ms") === 42L)
    assert(r.getAs[Long]("total_relationships") === 8L)
    assert(r.getAs[String]("relationship_types") === "many_to_one:8")
    // with a cache file: entries split fresh vs expired at nowMs
    val path = Files.createTempDirectory("graft_stats").toString + "/rels.parquet"
    val t0 = 1000L * 3600 * 1000
    engine.relationshipsCached(path, nowMs = t0)
    val withCache = engine
      .stats(cachePath = Some(path), nowMs = t0 + 25L * 3600 * 1000)
      .collect().head
    assert(withCache.getAs[Long]("n_cache_entries") === 8L)
    assert(withCache.getAs[Long]("n_cache_fresh") === 0L) // all past 24h TTL
    assert(withCache.getAs[Long]("n_cache_expired") === 8L)
  }

  test("incremental gate: first run processes all, saved state empties it") {
    val statePath = Files.createTempDirectory("graft_engine").toString + "/state.parquet"
    assert(engine.changedTables(statePath).count() === 10)
    engine.saveProcessedState(statePath, nowMs = 42L)
    assert(engine.changedTables(statePath).count() === 0)
  }
}
