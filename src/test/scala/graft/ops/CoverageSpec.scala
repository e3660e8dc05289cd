package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class CoverageSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val events = Seq(
    // user 1: events at 0h, 1h, 9h, 9.5h → one 8h gap
    (1L, ts(0), 10L), (1L, ts(3600), 11L), (1L, ts(9 * 3600), 12L),
    (1L, ts(9 * 3600 + 1800), 13L),
    // user 2: two events 7h apart → one gap exactly at threshold boundary
    (2L, ts(1000), 20L), (2L, ts(1000 + 7 * 3600), 21L),
    // user 3: single event → no gaps, span 0
    (3L, ts(50), 30L)
  ).toDF("user_id", "ts", "event_id")

  test("gaps finds exactly the holes >= threshold") {
    val out = Coverage.gaps(events, minGapUs = 6L * 3600 * 1000000)
      .orderBy("user_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(0) === 1L)
    assert(out(0).getAs[Long]("gap_us") === 8L * 3600 * 1000000)
    assert(out(0).getAs[Long]("gap_start_us") === 3600L * 1000000)
    assert(out(1).getLong(0) === 2L)
    assert(out(1).getAs[Long]("gap_us") === 7L * 3600 * 1000000)
  }

  test("coverageSummary: integer span and uncovered time per key") {
    val out = Coverage.coverageSummary(events, minGapUs = 6L * 3600 * 1000000)
      .orderBy("user_id").collect()
    assert(out.length === 3)
    val u1 = out(0)
    assert(u1.getAs[Long]("n_events") === 4L)
    assert(u1.getAs[Long]("n_gaps") === 1L)
    assert(u1.getAs[Long]("uncovered_us") === 8L * 3600 * 1000000)
    assert(u1.getAs[Long]("span_us") === (9L * 3600 + 1800) * 1000000)
    val u3 = out(2)
    assert(u3.getAs[Long]("n_gaps") === 0L)
    assert(u3.getAs[Long]("span_us") === 0L)
    assert(u3.getAs[Long]("uncovered_us") === 0L)
  }

  test("BIGINT ts columns are read as epoch nanoseconds") {
    val ns = Seq((1L, 1000L * 1000000000, 2L), (1L, (1000L + 8 * 3600) * 1000000000, 3L))
      .toDF("user_id", "ts", "event_id")
    val out = Coverage.gaps(ns, minGapUs = 6L * 3600 * 1000000).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("gap_us") === 8L * 3600 * 1000000)
    assert(out.head.getAs[Long]("gap_start_us") === 1000L * 1000000)
  }

  test("summary plan reuses the window's partitioning — one exchange only") {
    val plan = Coverage.coverageSummary(events).queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 === 1, plan)
  }

  test("forwardFill densifies each key's own span and fills from the last observation") {
    import spark.implicits._
    val series = Seq(
      ("a", 0L, 5L), ("a", 10L, 7L), ("a", 40L, 2L), // holes at 20, 30
      ("b", 100L, 9L)) // single bucket: no grid beyond itself
      .toDF("k", "bucket_us", "v")
    val out = Coverage.forwardFill(series, "k", "bucket_us", "v", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Long]("v"), r.getAs[Boolean]("was_gap"),
          r.getAs[Long]("filled_from_us"))).toMap
    assert(out.size === 6) // a: 0,10,20,30,40; b: 100
    assert(out(("a", 0L)) === ((5L, false, 0L)))
    assert(out(("a", 20L)) === ((7L, true, 10L))) // filled from bucket 10
    assert(out(("a", 30L)) === ((7L, true, 10L)))
    assert(out(("a", 40L)) === ((2L, false, 40L)))
    assert(out(("b", 100L)) === ((9L, false, 100L)))
    // grids never cross keys: no 'b' rows in a's range
    assert(!out.contains(("b", 0L)))
  }

  test("userActivityProfile: simpson concentration, gap regularity, degenerate users") {
    import spark.implicits._
    val ns = 1000000000L
    val ev = Seq(
      // user 1: metronome — 4 clicks exactly 10s apart → simpson 1, cv2 0
      (1L, 10L * ns, 1L, "click"), (2L, 20L * ns, 1L, "click"),
      (3L, 30L * ns, 1L, "click"), (4L, 40L * ns, 1L, "click"),
      // user 2: two types, one event each → simpson 0
      (5L, 50L * ns, 2L, "view"), (6L, 60L * ns, 2L, "purchase"),
      // user 3: single event → all-degenerate zeros
      (7L, 70L * ns, 3L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Coverage.userActivityProfile(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val u1 = out(1L)
    assert(u1.getAs[Long]("n_events") === 4L)
    assert(u1.getAs[Long]("n_types") === 1L)
    assert(u1.getAs[Long]("simpson_fp") === 1048576L) // 12/12
    assert(u1.getAs[Long]("mean_gap_s") === 10L)
    assert(u1.getAs[Long]("cv2_fp") === 0L) // perfectly regular
    val u2 = out(2L)
    assert(u2.getAs[Long]("simpson_fp") === 0L) // no same-type pair
    assert(u2.getAs[Long]("mean_gap_s") === 10L)
    val u3 = out(3L)
    assert(u3.getAs[Long]("n_events") === 1L)
    assert(u3.getAs[Long]("simpson_fp") === 0L)
    assert(u3.getAs[Long]("mean_gap_s") === 0L && u3.getAs[Long]("cv2_fp") === 0L)
  }

  test("conversionLag: first-to-first lag, pow-2 buckets, zero lag in min bucket") {
    import spark.implicits._
    val ns = 1000000000L
    val ev = Seq(
      // user 1: view at 0s, purchases at 100s and 10s → first purchase 10s
      (1L, 0L, 1L, "view"), (2L, 100L * ns, 1L, "purchase"),
      (3L, 10L * ns, 1L, "purchase"),
      // user 2: view and purchase same second → lag 0 → min bucket
      (4L, 500L * ns, 2L, "view"), (5L, 500L * ns, 2L, "purchase"),
      // user 3: purchase BEFORE view → excluded
      (6L, 700L * ns, 3L, "purchase"), (7L, 800L * ns, 3L, "view"),
      // user 4: view only → no conversion
      (8L, 900L * ns, 4L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Coverage.conversionLag(ev, "view", "purchase").collect()
      .map(r => r.getAs[Long]("bucket_s") -> r).toMap
    // lag 10 → bucket 16 (min bucket); lag 0 → bucket 16 as well
    assert(out.keySet === Set(16L))
    assert(out(16L).getAs[Long]("n_users") === 2L)
    assert(out(16L).getAs[Long]("min_lag_s") === 0L)
    assert(out(16L).getAs[Long]("max_lag_s") === 10L)
  }

  test("seasonalProfile: iso weekday cells, per-day normalization") {
    import spark.implicits._
    val ns = 1000000000L
    // 2026-08-10 is a Monday; epoch day maths: use explicit UTC instants
    val mon10 = java.time.LocalDateTime.of(2026, 8, 10, 9, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * ns
    val mon17 = java.time.LocalDateTime.of(2026, 8, 17, 9, 30)
      .toEpochSecond(java.time.ZoneOffset.UTC) * ns
    val tue11 = java.time.LocalDateTime.of(2026, 8, 11, 14, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * ns
    val ev = Seq(
      (1L, mon10, "click"), (2L, mon10 + ns, "click"),  // Mon 9h ×2
      (3L, mon17, "click"),                             // second Monday, 9h
      (4L, tue11, "view")                               // Tue 14h
    ).toDF("event_id", "ts", "event_type")
    val out = Coverage.seasonalProfile(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow"),
        r.getAs[Long]("hod")) -> r).toMap
    // Monday = 0, two distinct Mondays observed, 3 click events at 9h
    val monday = out(("click", 0L, 9L))
    assert(monday.getAs[Long]("n_events") === 3L)
    assert(monday.getAs[Long]("n_days") === 2L)
    assert(monday.getAs[Long]("rate_fp") === 3L * 1048576L / 2L)
    // Tuesday = 1, one date observed
    val tuesday = out(("view", 1L, 14L))
    assert(tuesday.getAs[Long]("n_events") === 1L)
    assert(tuesday.getAs[Long]("n_days") === 1L)
  }

  test("interArrival: per-(user,type) gaps, second quantization, exact CV2") {
    import spark.implicits._
    // user 1 'click': ns timestamps at 0s, 10s, 30s → gaps 10, 20
    // user 2 'click': 100s, 110s → gap 10        (separate stream, same type)
    // user 1 'view': single event → no gap
    val ns = 1000000000L
    val ev = Seq(
      (1L, 10L * ns, 1L, "click"), (2L, 20L * ns, 1L, "click"),
      (3L, 40L * ns, 1L, "click"),
      (4L, 100L * ns, 2L, "click"), (5L, 110L * ns, 2L, "click"),
      (6L, 50L * ns, 1L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Coverage.interArrival(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val c = out("click")
    // gaps in seconds: 10, 20, 10 → n=3, sum=40, max=20, sum2=600
    assert(c.getAs[Long]("n_gaps") === 3L)
    assert(c.getAs[Long]("sum_s") === 40L)
    assert(c.getAs[Long]("max_s") === 20L)
    assert(c.getAs[Long]("sum_s2") === 600L)
    assert(c.getAs[Long]("mean_s") === 13L) // floor(40/3)
    // cv2 = n·Σd²/S² − 1 = 1800/1600 − 1 = 1/8 → floor(2^20/8)
    assert(c.getAs[Long]("cv2_fp") === 131072L)
    assert(!out.contains("view"), "single-event streams have no gaps")
  }

  test("audienceOverlap: hand-computed intersections and Jaccard") {
    import spark.implicits._
    // users: view {1,2,3}, click {2,3,4}, purchase {3}
    val events = Seq(
      ("view", 1L), ("view", 2L), ("view", 3L), ("view", 2L),
      ("click", 2L), ("click", 3L), ("click", 4L),
      ("purchase", 3L))
      .toDF("event_type", "user_id")
    val out = Coverage.audienceOverlap(events).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    assert(out.keySet === Set(
      ("click", "view"), ("click", "purchase"), ("purchase", "view")))
    val cv = out(("click", "view"))
    assert(cv.getAs[Long]("n_a") === 3L && cv.getAs[Long]("n_b") === 3L)
    assert(cv.getAs[Long]("n_common") === 2L)
    assert(cv.getAs[Long]("jaccard_fp") === 2L * 1048576L / 4L)
    assert(out(("click", "purchase")).getAs[Long]("n_common") === 1L)
    assert(out(("purchase", "view")).getAs[Long]("jaccard_fp") === 1048576L / 3L)
  }
}
