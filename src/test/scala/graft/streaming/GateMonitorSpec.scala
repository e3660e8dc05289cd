package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GateMonitorSpec extends SparkSpec {

  private val codeDoc = "def f(x): return x + 1; if while for class"
  private val mixedDoc = "the cat is on the mat. der hund und die katze sind hier."
  private val cleanDoc = "the quick brown fox jumps over the lazy dog at home"

  test("cumulative gates accumulate across batches; re-delivery never double-counts") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_gate").toString
    val state = s"$base/state"

    // batch 0: one clean doc
    val r0 = GateMonitor.monitorBatch(
      Seq(cleanDoc).toDF("text"), "text", state, 0L).collect()(0)
    assert(r0.getAs[Long]("n_docs") === 1L)
    assert(r0.getAs[Long]("n_code") === 0L)
    assert(r0.getAs[Long]("n_mixed") === 0L)

    // batch 1 adds a code doc and a mixed doc → cumulative 3 docs, 1 code, 1 mixed
    val r1 = GateMonitor.monitorBatch(
      Seq(codeDoc, mixedDoc).toDF("text"), "text", state, 1L).collect()(0)
    assert(r1.getAs[Long]("n_docs") === 3L)
    assert(r1.getAs[Long]("n_code") === 1L)
    assert(r1.getAs[Long]("n_mixed") === 1L)
    assert(r1.getAs[Long]("code_share_fp") === 1048576L / 3L)
    assert(r1.getAs[Long]("mixed_share_fp") === 1048576L / 3L)
    val meanQ = r1.getAs[Long]("mean_quality_e6")
    assert(meanQ > 0L && meanQ <= 1000000L)

    // re-delivering batch 1 (foreachBatch at-least-once) changes nothing
    val r1again = GateMonitor.monitorBatch(
      Seq(codeDoc, mixedDoc).toDF("text"), "text", state, 1L).collect()(0)
    assert(r1again.getAs[Long]("n_docs") === 3L)
    assert(r1again.getAs[Long]("n_code") === 1L)
    assert(r1again.getAs[Long]("n_mixed") === 1L)
  }

  test("streaming surface writes one exactly-once cumulative scorecard per batch") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_gate_s").toString
    val src = s"$base/incoming"
    Seq(cleanDoc, codeDoc, mixedDoc).toDF("text").write.parquet(src)
    val q = GateMonitor.stream(
      spark.readStream.schema("text STRING").parquet(src),
      "text", s"$base/state", s"$base/reports", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val rep = spark.read.parquet(s"$base/reports")
    assert(rep.columns.contains("batch_id"), "partition dir must surface batch_id")
    // one batch (AvailableNow over one file listing) → final cumulative row
    val last = rep.orderBy(col("batch_id").desc).collect()(0)
    assert(last.getAs[Long]("n_docs") === 3L)
    assert(last.getAs[Long]("n_code") === 1L)
    assert(last.getAs[Long]("n_mixed") === 1L)
  }
}
