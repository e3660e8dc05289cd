package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrendingTermsSpec extends SparkSpec {

  private def top(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.orderBy(col("cms_estimate").desc, col("token").asc).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cms_estimate"))).toSeq

  test("counts accumulate across batches; estimates exact when no collisions") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_trend").toString
    // batch 0: "a" ×3, "b" ×1
    val r0 = TrendingTerms.monitorBatch(
      Seq("a a a b").toDF("text"), "text", s"$base/state", 0L, topK = 3)
    assert(top(r0) === Seq(("a", 3L), ("b", 1L)))
    // batch 1 adds "b" ×2, "c" ×2 → totals a=3, b=3, c=2
    val r1 = TrendingTerms.monitorBatch(
      Seq("b b c c").toDF("text"), "text", s"$base/state", 1L, topK = 3)
    assert(top(r1) === Seq(("a", 3L), ("b", 3L), ("c", 2L)))
    // re-delivery of batch 1: partitions overwrite, totals unchanged
    val r1b = TrendingTerms.monitorBatch(
      Seq("b b c c").toDF("text"), "text", s"$base/state", 1L, topK = 3)
    assert(top(r1b) === top(r1))
  }

  test("a term locally below top-k still surfaces once globally heavy") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_trend2").toString
    // "x" is #2 in every batch (never dropped at topK=2) while the #1
    // changes — after 3 batches x leads the global estimate
    TrendingTerms.monitorBatch(Seq("p p p x x").toDF("text"), "text", s"$base/s", 0L, topK = 2)
    TrendingTerms.monitorBatch(Seq("q q q x x").toDF("text"), "text", s"$base/s", 1L, topK = 2)
    val r = TrendingTerms.monitorBatch(
      Seq("r r r x x").toDF("text"), "text", s"$base/s", 2L, topK = 2)
    assert(top(r).head === (("x", 6L)))
  }

  test("partition-state monitor is provider-agnostic: identical top-k under RocksDB") {
    import spark.implicits._
    // TrendingTerms keeps its state in parquet partitions, not the Spark
    // state store — so swapping the store provider (the knob the
    // state-heavy operators need at scale) must change NOTHING here. Run
    // the same two-batch feed under the default provider and under
    // RocksDB via the engine's own scoped opt-in, and compare reports.
    def run(base: String): Seq[(String, Long)] = {
      Seq("a a a b").toDF("text").write.parquet(s"$base/in")
      val q = TrendingTerms.stream(
        spark.readStream.schema("text STRING").parquet(s"$base/in"),
        "text", s"$base/state", s"$base/reports", s"$base/ckpt", topK = 3)
      try q.processAllAvailable() finally q.stop()
      Seq("b b c c").toDF("text").write.mode("append").parquet(s"$base/in")
      val q2 = TrendingTerms.stream(
        spark.readStream.schema("text STRING").parquet(s"$base/in"),
        "text", s"$base/state", s"$base/reports", s"$base/ckpt", topK = 3)
      try q2.processAllAvailable() finally q2.stop()
      val rep = spark.read.parquet(s"$base/reports")
      val last = rep.agg(max(col("batch_id")).cast("long"))
        .collect().head.getLong(0)
      top(rep.filter(col("batch_id") === last).drop("batch_id"))
    }
    val plain = run(
      java.nio.file.Files.createTempDirectory("graft_trend_p").toString)
    val rocks = StateBackend.using(spark, StateBackend.RocksDb) {
      run(java.nio.file.Files.createTempDirectory("graft_trend_r").toString)
    }
    assert(rocks === plain)
    assert(plain === Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("compactEvery folds both state trees (sketch additively, candidates as a distinct set)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_trend_ac").toString
    // two batches through monitorBatch, then fold the trees directly
    TrendingTerms.monitorBatch(Seq("a a a b").toDF("text"), "text", s"$base/s", 0L, topK = 3)
    val before = TrendingTerms.monitorBatch(
      Seq("b b c c").toDF("text"), "text", s"$base/s", 1L, topK = 3)
    val expect = top(before.drop("batch_id"))
    assert(BatchSink.compact(spark, s"$base/s/sketch", Seq("row_i", "pos"), Seq("c")) === 1L)
    assert(BatchSink.compact(spark, s"$base/s/cand", Seq("token"), Seq.empty) === 1L)
    // a third batch over the folded trees sees the same cumulative state
    val after = TrendingTerms.monitorBatch(
      Seq("").toDF("text"), "text", s"$base/s", 2L, topK = 3)
    assert(top(after.drop("batch_id")) === expect)
    // candidate tree folded to distinct tokens, no count column
    val cand = spark.read.parquet(s"$base/s/cand/batch_id=1")
    assert(cand.columns.toSeq === Seq("token"))
    assert(cand.count() === cand.distinct().count())
  }

  test("streaming surface: exactly-once per-batch report partitions") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_trend3").toString
    Seq("m m n").toDF("text").write.parquet(s"$base/in")
    val q = TrendingTerms.stream(
      spark.readStream.schema("text STRING").parquet(s"$base/in"),
      "text", s"$base/state", s"$base/reports", s"$base/ckpt", topK = 2)
    try q.processAllAvailable() finally q.stop()
    val rep = spark.read.parquet(s"$base/reports")
    assert(rep.columns.contains("batch_id"))
    assert(top(rep.drop("batch_id")) === Seq(("m", 2L), ("n", 1L)))
  }
}
