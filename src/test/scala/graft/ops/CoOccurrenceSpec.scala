package graft.ops

import graft.SparkSpec

class CoOccurrenceSpec extends SparkSpec {

  test("pairs: support counts, quantity-line dedup, minSupport filter") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L), // duplicate (1,20) line must not inflate
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L)
    ).toDF("basket", "item")
    val out = CoOccurrence.pairs(df, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((10L, 20L) -> 3L)) // (10,30) and (20,30) have support 1
  }

  test("pairs: oversized baskets dropped; basketStats reports the drop") {
    import spark.implicits._
    val big = (1 to 10).map(i => (9L, i.toLong))
    val df = (Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)) ++ big).toDF("basket", "item")
    val out = CoOccurrence.pairs(df, "basket", "item", minSupport = 1L, maxBasketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((1L, 2L) -> 2L)) // basket 9 contributes nothing
    val stats = CoOccurrence.basketStats(df, "basket", "item", maxBasketSize = 5)
      .collect().head
    assert(stats.getAs[Long]("n_baskets") === 3L)
    assert(stats.getAs[Long]("max_basket") === 10L)
    assert(stats.getAs[Long]("n_dropped") === 1L)
  }

  test("rules: hand-computed confidence and lift, both orientations") {
    import spark.implicits._
    val df = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y"))
      .toDF("basket", "item")
    val out = CoOccurrence.rules(df, "basket", "item", minSupport = 2L)
      .collect()
      .map(r => (r.getAs[String]("antecedent"), r.getAs[String]("consequent")) -> r)
      .toMap
    // only (x,y) clears support 2: both orientations, N=4, n_x=3, n_y=3
    assert(out.keySet === Set(("x", "y"), ("y", "x")))
    val xy = out(("x", "y"))
    assert(xy.getAs[Long]("support") === 2L)
    assert(xy.getAs[Long]("n_ant") === 3L)
    assert(xy.getAs[Long]("n_cons") === 3L)
    assert(xy.getAs[Long]("n_baskets") === 4L)
    assert(xy.getAs[Long]("confidence_fp") === 2L * 1048576L / 3L)
    assert(xy.getAs[Long]("lift_fp") === 2L * 4L * 1048576L / 9L)
    assert(out(("y", "x")).getAs[Long]("lift_fp") === 2L * 4L * 1048576L / 9L)
  }
}
