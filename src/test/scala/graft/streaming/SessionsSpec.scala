package graft.streaming

import graft.SparkSpec

class SessionsSpec extends SparkSpec {

  private def ns(sec: Long): Long = sec * 1000000000L

  test("topPaths: session-scoped signatures, gap splits, truncation at maxSteps") {
    import spark.implicits._
    val events = Seq(
      // u1 session 1: view>click>purchase ; session 2 (gap > 30m): view
      (1L, 1L, "view", ns(1000)), (2L, 1L, "click", ns(1010)),
      (3L, 1L, "purchase", ns(1020)), (4L, 1L, "view", ns(1020 + 3600)),
      // u2: view>click (same signature prefix as u1's first session? no — shorter)
      (5L, 2L, "view", ns(50)), (6L, 2L, "click", ns(60)),
      // u3: seven views — path truncates at 5 steps
      (7L, 3L, "view", ns(1)), (8L, 3L, "view", ns(2)), (9L, 3L, "view", ns(3)),
      (10L, 3L, "view", ns(4)), (11L, 3L, "view", ns(5)), (12L, 3L, "view", ns(6)),
      (13L, 3L, "view", ns(7))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Sessions.topPaths(events, gapMinutes = 30, maxSteps = 5, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "view>click>purchase" -> 1L,
      "view" -> 1L,
      "view>click" -> 1L,
      "view>view>view>view>view" -> 1L))
  }

  test("topPaths: ties order by path, k limits output") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "b", ns(1)), (2L, 2L, "a", ns(1)), (3L, 3L, "a", ns(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Sessions.topPaths(events, 30, 5, 1).collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "a" && out.head.getLong(1) === 2L)
  }
}
