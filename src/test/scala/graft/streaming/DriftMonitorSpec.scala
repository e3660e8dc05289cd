package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftMonitorSpec extends SparkSpec {

  private def report(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Long)] =
    df.collect().map(r => r.getAs[String]("key") ->
      ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"), r.getAs[Long]("drift_num")))).toMap

  test("running counts accumulate across batches; re-delivery never double-counts") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_drift").toString
    val counts = s"$base/counts"
    // reference freeze: 3 en, 1 de (t_ref = 4)
    val ref = Seq("en", "en", "en", "de").toDF("lang")
      .groupBy(col("lang").as("key")).agg(count(lit(1)).as("n_ref"))

    // batch 0: 2 en → t_cur = 2; drift_en = |3·2 − 2·4| = 2, drift_de = |1·2 − 0| = 2
    val r0 = report(DriftMonitor.monitorBatch(
      Seq("en", "en").toDF("lang"), ref, "lang", counts, 0L))
    assert(r0 === Map("en" -> ((3L, 2L, 2L)), "de" -> ((1L, 0L, 2L))))

    // batch 1 adds 1 de, 1 fr → cumulative 2 en, 1 de, 1 fr (t_cur = 4)
    val r1 = report(DriftMonitor.monitorBatch(
      Seq("de", "fr").toDF("lang"), ref, "lang", counts, 1L))
    assert(r1 === Map(
      "en" -> ((3L, 2L, 4L)),  // |3·4 − 2·4|
      "de" -> ((1L, 1L, 0L)),  // matched share
      "fr" -> ((0L, 1L, 4L)))) // ref never saw fr
    // re-delivering batch 1 overwrites its partition: same state, same report
    val r1again = report(DriftMonitor.monitorBatch(
      Seq("de", "fr").toDF("lang"), ref, "lang", counts, 1L))
    assert(r1again === r1)
  }

  test("streaming surface writes one exactly-once report per batch") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_drift_s").toString
    val ref = Seq("en", "de").toDF("lang")
      .groupBy(col("lang").as("key")).agg(count(lit(1)).as("n_ref"))
    val src = s"$base/incoming"
    Seq("en", "en", "de").toDF("lang").write.parquet(src)
    val q = DriftMonitor.stream(
      spark.readStream.schema("lang STRING").parquet(src),
      ref, "lang", s"$base/counts", s"$base/reports", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val rep = spark.read.parquet(s"$base/reports")
    assert(rep.columns.contains("batch_id"), "partition dir must surface batch_id")
    val byKey = rep.collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("n_cur")).toMap
    assert(byKey === Map("en" -> 2L, "de" -> 1L))
  }
}
