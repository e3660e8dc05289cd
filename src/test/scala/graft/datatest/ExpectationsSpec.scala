package graft.datatest

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import Expectations._

  test("each rule counts its violations exactly; all rules share one scan") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), "a", 5.0, "1-URGENT"),
      (Some(1L), "b", -2.0, "9-BAD"),    // duplicate id, below range, bad pattern
      (None, "c", 150.0, "2-HIGH"))      // null id, above range
      .toDF("id", "k", "v", "p")
    val out = check(df, Seq(
      NotNull("id"),
      Unique("id"),
      InRange("v", 0.0, 100.0),
      Matches("p", "[1-5]-[A-Z]+"),
      MinRows(5L))).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("not_null") === ((1L, false)))
    assert(out("unique") === ((1L, false)))   // two non-null ids, one distinct
    assert(out("in_range") === ((2L, false))) // -2 and 150
    assert(out("matches") === ((1L, false)))  // only "9-BAD" fails
    assert(out("min_rows") === ((2L, false))) // 3 rows, 5 required
  }

  test("a clean table passes every rule") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val out = check(df, Seq(NotNull("id"), Unique("id"),
      InRange("v", 0.0, 100.0), MinRows(2L))).collect()
    assert(out.forall(_.getBoolean(3)))
    assert(out.forall(_.getLong(2) === 0L))
  }

  test("Matches is a FULL match — partial hits still violate") {
    import spark.implicits._
    val df = Seq("abc", "xabcx").toDF("s")
    val out = check(df, Seq(Matches("s", "abc"))).collect().head
    assert(out.getLong(2) === 1L) // "xabcx" contains but doesn't equal
  }
}
