package graft.analyze

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class FunctionalDepsSpec extends SparkSpec {

  private def rows(out: org.apache.spark.sql.DataFrame) =
    out.collect().map(r => ((r.getAs[String]("determinant"),
      r.getAs[String]("dependent")), r.getAs[Boolean]("holds"))).toMap

  test("detects held and violated dependencies in both directions") {
    import spark.implicits._
    // zip -> city holds; city -> zip does not (one city, two zips);
    // id -> everything holds (id is unique).
    val df = Seq(
      (1L, "10001", "nyc"),
      (2L, "10001", "nyc"),
      (3L, "10002", "nyc"),
      (4L, "94103", "sf")).toDF("id", "zip", "city")
    val holds = rows(FunctionalDeps.discover(df, "addr", Seq("id", "zip", "city")))
    assert(holds(("zip", "city")))
    assert(!holds(("city", "zip")))
    assert(holds(("id", "zip")) && holds(("id", "city")))
    assert(!holds(("zip", "id")) && !holds(("city", "id")))
  }

  test("NULL is one determinant value and one dependent value (struct counting)") {
    import spark.implicits._
    // a=NULL maps to two different b values -> NULL violates a -> b;
    // every b value (incl. NULL) maps to one a -> b -> a holds.
    val df = Seq(
      (Option.empty[Long], Some(1L)),
      (Option.empty[Long], Some(2L)),
      (Some(7L), Option.empty[Long])).toDF("a", "b")
    val out = FunctionalDeps.discover(df, "t", Seq("a", "b"))
    val holds = rows(out)
    assert(!holds(("a", "b")))
    assert(holds(("b", "a")))
    // counts: distinct a = {NULL, 7} = 2; distinct (a,b) = 3
    val ab = out.filter(col("determinant") === "a").collect().head
    assert(ab.getAs[Long]("n_det") === 2L)
    assert(ab.getAs[Long]("n_pair") === 3L)
    assert(ab.getAs[Long]("n_rows") === 3L)
  }

  test("split distinct branches: no Expand, map-side partials, broadcast assembly") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L), (4L, 5L, 6L)).toDF("x", "y", "z")
    val plan = FunctionalDeps.discover(df, "t", Seq("x", "y", "z"))
      .queryExecution.executedPlan.toString
    // each COUNT(DISTINCT …) is its own narrow two-phase aggregate — the
    // old single-agg form compiled to an Expand duplicating every scan row
    // (k cols + p pairs + 1) times through one wide hash aggregate
    assert(!plan.contains("Expand"),
      "distinct counts must not ride a row-duplicating Expand")
    assert(plan.contains("partial_count"), "branches must combine map-side")
    // assembly of the single-row branches is broadcast, never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
  }

  test("approxDeps: exact g3 violation counts, perfect FD at zero") {
    import spark.implicits._
    // a -> b: a=1 maps to {x,x,y} (1 violation), a=2 maps to {z} (0)
    // b -> a: x -> {1,1}, y -> {1}, z -> {2} → 0 violations (b determines a)
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "z")).toDF("a", "b")
    val out = FunctionalDeps.approxDeps(df, "t", Seq(("a", "b"), ("b", "a")))
      .collect()
      .map(r => (r.getAs[String]("determinant"), r.getAs[String]("dependent")) -> r)
      .toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("n_rows") === 4L)
    assert(ab.getAs[Long]("n_det") === 2L)
    assert(ab.getAs[Long]("violations") === 1L)
    assert(!ab.getAs[Boolean]("holds"))
    assert(ab.getAs[Long]("violation_fp") === 1048576L / 4L)
    val ba = out(("b", "a"))
    assert(ba.getAs[Long]("violations") === 0L)
    assert(ba.getAs[Boolean]("holds"))
  }
}
