package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {

  test("collapses no-op changes, numbers versions, half-open windows") {
    import spark.implicits._
    val log = Seq( // k1: a,a,b,a — the repeat at t2 must not open a version
      ("k1", 1L, "a"), ("k1", 2L, "a"), ("k1", 3L, "b"), ("k1", 4L, "a"),
      ("k2", 5L, "x"))
      .toDF("k", "ts", "state")
    val out = Scd2.fromChangeLog(log, Seq("k"), "ts", Seq("state"))
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      ("k1", "a", 1L, Some(3L), 1L, false),
      ("k1", "b", 3L, Some(4L), 2L, false),
      ("k1", "a", 4L, None, 3L, true),
      ("k2", "x", 5L, None, 1L, true)))
  }

  test("all-null opening attrs survive; null->value is a change") {
    import spark.implicits._
    val log = Seq(
      ("k", 1L, Option.empty[String]),
      ("k", 2L, Option.empty[String]), // null == null: no new version
      ("k", 3L, Some("v")))
      .toDF("k", "ts", "state")
    val out = Scd2.fromChangeLog(log, Seq("k"), "ts", Seq("state"))
      .orderBy("version").collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(1) && out(0).getLong(2) === 1L)
    assert(out(1).getString(1) === "v" && out(1).getBoolean(5))
  }

  test("plans a single exchange: both windows reuse one key shuffle") {
    import spark.implicits._
    val log = Seq(("k", 1L, "a")).toDF("k", "ts", "state")
    val plan = Scd2.fromChangeLog(log, Seq("k"), "ts", Seq("state"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 shuffle, plan:\n$plan")
  }
}
