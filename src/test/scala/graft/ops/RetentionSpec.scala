package graft.ops

import graft.SparkSpec

class RetentionSpec extends SparkSpec {

  private val weekNs = 7L * 86400L * 1000000000L

  test("weeklyRetention: cohort triangle with exact fractions") {
    import spark.implicits._
    // users 1,2,3 first seen week 0; 1 and 2 return week 1; 1 returns week 2.
    // user 4 first seen week 1, returns week 2.
    val events = Seq(
      (1L, 0L), (2L, 0L), (3L, 0L),
      (1L, weekNs), (2L, weekNs), (4L, weekNs),
      (1L, 2 * weekNs), (4L, 2 * weekNs),
      (1L, 2 * weekNs + 1000L) // same week twice: distinct collapses
    ).toDF("user_id", "ts")
    val out = Retention.weeklyRetention(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out((0L, 0L)) === ((3L, 3L, 1.0)))
    assert(out((0L, 1L)) === ((2L, 3L, 2.0 / 3.0)))
    assert(out((0L, 2L)) === ((1L, 3L, 1.0 / 3.0)))
    assert(out((1L, 0L)) === ((1L, 1L, 1.0)))
    assert(out((1L, 1L)) === ((1L, 1L, 1.0)))
    assert(out.size === 5)
  }
}
