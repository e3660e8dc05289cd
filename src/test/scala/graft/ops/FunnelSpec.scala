package graft.ops

import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  private val stages = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, String, Long)], window: Long = 100L) = {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_type", "ts")
    Funnel.conversion(df, "user_id", "event_type", "ts", stages, window)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
  }

  test("ordered completion, out-of-order, and window expiry") {
    val out = run(Seq(
      // u1 completes: view@10, click@50, purchase@120 (each gap <= 100)
      (1L, "view", 10L), (1L, "click", 50L), (1L, "purchase", 120L),
      // u2 purchase BEFORE click: sequence is view,purchase,click → stops at click
      (2L, "view", 10L), (2L, "purchase", 20L), (2L, "click", 30L),
      // u3 click arrives 200 after view: window (100) expired → stage 1 only
      (3L, "view", 10L), (3L, "click", 210L),
      // u4 never views: clicks alone don't enter the funnel
      (4L, "click", 10L)))
    assert(out.toSeq === Seq(
      (1L, "view", 3L, 1.0),
      (2L, "click", 2L, 2.0 / 3.0),
      (3L, "purchase", 1L, 1.0 / 3.0)))
  }

  test("same-timestamp tie consumes the earlier stage first") {
    // view and click at the same instant: view is accepted first (stage
    // ascending on ties), then the click advances the funnel at zero gap.
    val out = run(Seq((1L, "view", 10L), (1L, "click", 10L)))
    assert(out.toSeq === Seq((1L, "view", 1L, 1.0), (2L, "click", 1L, 1.0)))
  }

  test("repeat stages neither advance nor reset") {
    val out = run(Seq(
      (1L, "view", 0L), (1L, "view", 40L), (1L, "click", 90L),
      // second view at 40 must NOT refresh the entry: click at 90 is within
      // 100 of view@0 anyway; purchase at 250 is beyond 100 of click@90.
      (1L, "purchase", 250L)))
    assert(out.toSeq === Seq((1L, "view", 1L, 1.0), (2L, "click", 1L, 1.0)))
  }
}
