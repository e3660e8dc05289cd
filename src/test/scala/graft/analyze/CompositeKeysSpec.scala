package graft.analyze

import graft.SparkSpec

class CompositeKeysSpec extends SparkSpec {

  test("finds the unique pair, rejects non-unique ones, nulls are values") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10L), "x"),
      (1L, Some(20L), "x"),
      (2L, Some(10L), "y"),
      (2L, None, "y"),
      (2L, None, "y") // duplicate (2, NULL): (a, b) is NOT a key
    ).toDF("a", "b", "c")
    val out = CompositeKeys.compositeKeys(df, "t", Seq("a", "b", "c"))
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out.size === 3)
    assert(out(("a", "b")) === ((5L, 4L, false))) // NULL dup collapses
    assert(out(("a", "c")) === ((5L, 2L, false)))
    assert(out(("b", "c")) === ((5L, 4L, false)))
    val unique = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("p", "q")
    val u = CompositeKeys.compositeKeys(unique, "u", Seq("p", "q")).collect().head
    assert(u.getAs[Boolean]("is_key"))
    assert(u.getAs[Long]("n_distinct") === 3L)
  }
}
