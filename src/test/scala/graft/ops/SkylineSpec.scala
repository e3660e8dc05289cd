package graft.ops

import graft.SparkSpec

class SkylineSpec extends SparkSpec {

  test("paretoFront: keeps non-dominated rows, keeps coordinate ties, drops dominated") {
    import spark.implicits._
    val pts = Seq(
      (1L, 5L, 1L), // front (longest)
      (2L, 5L, 1L), // exact tie with 1 — both survive
      (3L, 4L, 3L), // front
      (4L, 3L, 3L), // dominated by 3 (same y, smaller x)
      (5L, 2L, 5L), // front (highest)
      (6L, 4L, 2L), // dominated by 3 (same x, smaller y)
      (7L, 1L, 0L)  // dominated by everything
    ).toDF("id", "x", "y")
    val got = Skyline.paretoFront(pts, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L, 5L))
  }

  test("paretoFront: single row and monotone chain are both all-front") {
    import spark.implicits._
    val one = Seq((1L, 10L, 10L)).toDF("id", "x", "y")
    assert(Skyline.paretoFront(one, "x", "y").count() === 1)
    // strictly trading x for y: nothing dominates anything
    val chain = (1 to 6).map(i => (i.toLong, i.toLong, (10 - i).toLong)).toDF("id", "x", "y")
    assert(Skyline.paretoFront(chain, "x", "y").count() === 6)
  }
}
