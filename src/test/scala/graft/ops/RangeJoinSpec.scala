package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("point-in-interval: containment, overlaps, half-open bounds") {
    import spark.implicits._
    val intervals = Seq( // (win, start, end) — [20,40) and overlapping [30,60)
      ("w1", 20L, 40L), ("w2", 30L, 60L)).toDF("win", "s", "e")
    val points = Seq(
      (1L, 10L), // before all → dropped
      (2L, 25L), // w1 only
      (3L, 35L), // w1 AND w2 (overlap → two rows)
      (4L, 40L), // end of w1 is exclusive → w2 only
      (5L, 59L), // w2 only
      (6L, 60L)) // end exclusive → dropped
      .toDF("id", "t")
    val out = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", bucketWidth = 16L)
      .select("id", "win").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((2L, "w1"), (3L, "w1"), (3L, "w2"), (4L, "w2"), (5L, "w2")))
  }

  test("bucketing keeps the join equi-keyed: no nested-loop, no cartesian") {
    import spark.implicits._
    val intervals = Seq(("w", 0L, 100L)).toDF("win", "s", "e")
    val points = Seq((1L, 50L)).toDF("id", "t")
    val plan = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("exactness at epoch-ns magnitude (beyond double precision)") {
    import spark.implicits._
    val w = 3600L * 1000000000L
    val bound = 472222L * w // an exact bucket boundary around 2023-ish ns
    val intervals = Seq(("w", bound, bound + w)).toDF("win", "s", "e")
    val points = Seq((1L, bound - 1), (2L, bound), (3L, bound + w - 1), (4L, bound + w))
      .toDF("id", "t")
    val out = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", w)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out === Set(2L, 3L)) // boundary-exact: −1 below in, end excluded
  }
}
