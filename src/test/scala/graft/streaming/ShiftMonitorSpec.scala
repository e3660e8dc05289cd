package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShiftMonitorSpec extends SparkSpec {

  private val hourNs = 3600L * 1000000000L

  private def mkEvents(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    // (type, hour, n) expanded to n events inside that hour
    rows.flatMap { case (t, h, n) =>
      (0L until n).map(i => (t, h * hourNs + i + 1))
    }.toDF("event_type", "ts")
  }

  private def byType(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("event_type") -> r).toMap

  test("cumulative change point updates as the shift arrives; re-delivery is idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft_shift").toString
    val counts = s"$base/counts"

    // batch 0: steady hours 1..3 at rate 1 — flat sequence, zero deviation
    val r0 = byType(ShiftMonitor.monitorBatch(
      mkEvents(Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L))), counts, 0L))
    assert(r0("a").getAs[Long]("d_num") === 0L)
    assert(r0("a").getAs[Long]("split_pos") === 1L) // tie → earliest

    // batch 1: hours 4..5 jump to rate 9 — cumulative [1,1,1,9,9] peaks
    // at position 3 with |S_3·5 − 3·21| = 48 (the q236 fixture)
    val r1 = byType(ShiftMonitor.monitorBatch(
      mkEvents(Seq(("a", 4L, 9L), ("a", 5L, 9L))), counts, 1L))
    assert(r1("a").getAs[Long]("n_buckets") === 5L)
    assert(r1("a").getAs[Long]("n_events") === 21L)
    assert(r1("a").getAs[Long]("split_pos") === 3L)
    assert(r1("a").getAs[Long]("split_bucket") === 3L)
    assert(r1("a").getAs[Long]("d_num") === 48L)

    // re-delivering batch 1 finds its partition complete: same state
    val r1again = byType(ShiftMonitor.monitorBatch(
      mkEvents(Seq(("a", 4L, 9L), ("a", 5L, 9L))), counts, 1L))
    assert(r1again("a").getAs[Long]("d_num") === 48L)
    assert(r1again("a").getAs[Long]("n_events") === 21L)

    // a late batch filling hour 2 merges into its true bucket
    val r2 = byType(ShiftMonitor.monitorBatch(
      mkEvents(Seq(("a", 2L, 8L))), counts, 2L))
    // cumulative [1,9,1,9,9]: the early spike pulls the peak forward
    assert(r2("a").getAs[Long]("n_events") === 29L)
    assert(r2("a").getAs[Long]("n_buckets") === 5L)
  }

  test("compacting the count tree mid-stream changes nothing the reports can see") {
    // two trees fed the same batches; one compacts between batches 2 and 3
    val basePlain = java.nio.file.Files.createTempDirectory("graft_shift_p").toString
    val baseComp = java.nio.file.Files.createTempDirectory("graft_shift_c").toString
    val batches = Seq(
      mkEvents(Seq(("a", 1L, 1L), ("a", 2L, 1L), ("b", 1L, 4L))),
      mkEvents(Seq(("a", 3L, 1L), ("b", 2L, 4L))),
      mkEvents(Seq(("a", 4L, 9L), ("a", 5L, 9L))),
      mkEvents(Seq(("a", 2L, 8L), ("b", 3L, 1L))))
    def run(counts: String, compactAfter: Option[Int]) =
      batches.zipWithIndex.map { case (b, i) =>
        val rep = byType(ShiftMonitor.monitorBatch(b, counts, i.toLong))
          .map { case (t, r) => t ->
            ((r.getAs[Long]("n_buckets"), r.getAs[Long]("n_events"),
              r.getAs[Long]("split_bucket"), r.getAs[Long]("d_num"))) }
        if (compactAfter.contains(i)) {
          val w = BatchSink.compact(spark, counts, Seq("etype", "bucket"), Seq("n"))
          assert(w === i.toLong)
        }
        rep
      }
    val plain = run(s"$basePlain/counts", None)
    val compacted = run(s"$baseComp/counts", Some(2))
    assert(compacted === plain)
    // the tree really did shrink to one consolidated dir + the post-compact batch
    val dirs = new java.io.File(s"$baseComp/counts").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted
    assert(dirs.toSeq === Seq("batch_id=2", "batch_id=3"))
    // a redelivery of a FOLDED batch is skipped by the watermark, not re-added
    val again = byType(ShiftMonitor.monitorBatch(batches(1), s"$baseComp/counts", 1L))
    assert(again("a").getAs[Long]("n_events") ===
      plain.last("a")._2)
  }

  test("streaming surface writes one exactly-once report per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_shift_s").toString
    val source = MemoryStream[(String, Long)]
    val df = source.toDF().toDF("event_type", "ts")
    source.addData(("a", 1L * hourNs + 1), ("a", 2L * hourNs + 1))
    val q = ShiftMonitor.stream(
      df, s"$base/counts", s"$base/report", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val rep = spark.read.parquet(s"$base/report")
    assert(rep.where(col("batch_id") === 0).count() === 1L)
    val row = rep.where(col("batch_id") === 0).collect().head
    assert(row.getAs[String]("event_type") === "a")
    assert(row.getAs[Long]("n_buckets") === 2L)
  }

  test("compactEvery folds the count tree inside the stream without changing reports") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_shift_ac").toString
    val source = MemoryStream[(String, Long)]
    val df = source.toDF().toDF("event_type", "ts")
    // ProcessingTime trigger: AvailableNow would snapshot the (empty)
    // source at start and terminate before the staged addData arrives
    val q = ShiftMonitor.stream(
      df, s"$base/counts", s"$base/report", s"$base/ckpt", compactEvery = 2,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // 4 micro-batches → auto-compaction after batches 1 and 3
      Seq(
        Seq(("a", 1L * hourNs + 1), ("a", 2L * hourNs + 1)),
        Seq(("a", 3L * hourNs + 1)),
        Seq(("a", 4L * hourNs + 1), ("a", 4L * hourNs + 2)),
        Seq(("a", 5L * hourNs + 1))).foreach { batch =>
        source.addData(batch: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // tree bounded: batches 0..3 folded into batch_id=3 (watermark 3)
    val dirs = new java.io.File(s"$base/counts").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted
    assert(dirs.toSeq === Seq("batch_id=3"))
    // final report reflects ALL five hourly buckets and six events
    val rep = spark.read.parquet(s"$base/report")
    val last = rep.where(col("batch_id") === 3).collect().head
    assert(last.getAs[Long]("n_buckets") === 5L)
    assert(last.getAs[Long]("n_events") === 6L)
  }
}
