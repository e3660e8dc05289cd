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

  test("incremental gate: first run processes all, saved state empties it") {
    val statePath = Files.createTempDirectory("graft_engine").toString + "/state.parquet"
    assert(engine.changedTables(statePath).count() === 10)
    engine.saveProcessedState(statePath, nowMs = 42L)
    assert(engine.changedTables(statePath).count() === 0)
  }
}
