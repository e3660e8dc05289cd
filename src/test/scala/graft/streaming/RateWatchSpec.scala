package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class RateWatchSpec extends SparkSpec {

  private def ns(hour: Long): Long = hour * 3600L * 1000000000L

  /** steady stream: one event per hour per type, then a burst. */
  private def events(rows: Seq[(Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, h, t) => (id, ns(h) + id % 1000, t, 1.0) }
      .toDF("event_id", "ts", "event_type", "value")
  }

  test("spike surfaces after enough history; late partials merge into their hour") {
    val base = java.nio.file.Files.createTempDirectory("graft_rw").toString
    val state = s"$base/state"
    var id = 0L
    def mk(hours: Range, perHour: Int): Seq[(Long, Long, String)] =
      hours.flatMap(h => (1 to perHour).map { _ => id += 1; (id, h.toLong, "click") })

    // batch 0: hours 0..19 at 5/hour — no anomalies (flat)
    val r0 = RateWatch.monitorBatch(events(mk(0 until 20, 5)), state, 0L,
      window = 8, k = 3, minWindow = 6)
    assert(r0.count() === 0L)

    // batch 1: hour 20 bursts to 50 → flagged
    val r1 = RateWatch.monitorBatch(events(mk(20 until 21, 50)), state, 1L,
      window = 8, k = 3, minWindow = 6)
    val flagged = r1.collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events")))
    assert(flagged.length === 1)
    assert(flagged.head._2 === 50L)

    // batch 2: 45 LATE events for hour 19 — merged into hour 19's count
    // (5 + 45 = 50), so hour 19 now also exceeds 3·MAD of its window
    val r2 = RateWatch.monitorBatch(events(mk(19 until 20, 45)), state, 2L,
      window = 8, k = 3, minWindow = 6)
    val hours = r2.collect().map(_.getAs[Long]("n_events")).sorted.toSeq
    assert(hours === Seq(50L, 50L)) // hours 19 and 20 both anomalous now

    // re-delivery of batch 2 is a no-op (Ignore partition): same verdict
    val r2again = RateWatch.monitorBatch(events(mk(19 until 20, 45)), state, 2L,
      window = 8, k = 3, minWindow = 6)
    assert(r2again.collect().map(_.getAs[Long]("n_events")).sorted.toSeq === hours)
  }
}
