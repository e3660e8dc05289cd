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

  private def scd2Rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      Option(r.get(3)).map(_.asInstanceOf[Long]),
      r.getAs[Long]("version"), r.getAs[Boolean]("is_current"))).toSet

  test("applyChanges on append-only updates equals the full rebuild") {
    import spark.implicits._
    val full = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "a"), ("u1", 5L, "b"),
      ("u2", 1L, "x"), ("u2", 6L, "y"),
      ("u3", 7L, "z")).toDF("k", "ts", "state")
    val pre = full.filter($"ts" < 5)
    val post = full.filter($"ts" >= 5)
    val merged = Scd2.applyChanges(
      Scd2.fromChangeLog(pre, Seq("k"), "ts", Seq("state")),
      post, Seq("k"), "ts", Seq("state"))
    val rebuilt = Scd2.fromChangeLog(full, Seq("k"), "ts", Seq("state"))
    assert(scd2Rows(merged) === scd2Rows(rebuilt))
  }

  test("applyChanges: untouched keys pass through; late inserts split windows; update wins collisions") {
    import spark.implicits._
    val pre = Seq(
      ("u1", 1L, "a"), ("u1", 10L, "b"), // u1 will get a late insert + correction
      ("u2", 1L, "x")).toDF("k", "ts", "state") // u2 untouched
    val current = Scd2.fromChangeLog(pre, Seq("k"), "ts", Seq("state"))
    val updates = Seq(
      ("u1", 5L, "m"), // lands between versions: splits [1,10) into [1,5)+[5,10)
      ("u1", 10L, "c")) // same ts as an existing version: the update wins
      .toDF("k", "ts", "state")
    val out = Scd2.applyChanges(current, updates, Seq("k"), "ts", Seq("state"))
    val u1 = out.filter($"k" === "u1").collect()
      .map(r => (r.getAs[Long]("effective_from"), r.getString(1),
        Option(r.getAs[Any]("effective_to")).map(_.asInstanceOf[Long]),
        r.getAs[Long]("version"))).sortBy(_._4)
    assert(u1.toSeq === Seq(
      (1L, "a", Some(5L), 1L), (5L, "m", Some(10L), 2L), (10L, "c", None, 3L)))
    // u2 row is byte-identical to its current version (anti-join passthrough)
    val u2 = out.filter($"k" === "u2")
    assert(scd2Rows(u2) === scd2Rows(current.filter($"k" === "u2")))
  }

  test("applyChanges: a no-op re-statement of the current value opens no version") {
    import spark.implicits._
    val pre = Seq(("u1", 1L, "a")).toDF("k", "ts", "state")
    val current = Scd2.fromChangeLog(pre, Seq("k"), "ts", Seq("state"))
    val out = Scd2.applyChanges(
      current, Seq(("u1", 9L, "a")).toDF("k", "ts", "state"),
      Seq("k"), "ts", Seq("state"))
    assert(out.count() === 1)
    assert(out.collect().head.getAs[Long]("effective_from") === 1L)
  }
}
