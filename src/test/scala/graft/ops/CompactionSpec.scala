package graft.ops

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private val units = Seq(
    ("p00", 40L), ("p01", 40L), ("p02", 40L), // 0,40,80 → groups 0,0,0
    ("p03", 10L), // 120 → group 1
    ("p04", 150L), // 130 → group 1 (straddles: stays with its offset)
    ("p05", 5L)) // 280 → group 2
    .toDF("part", "rows")

  test("plan assigns offset-binned groups over the exclusive prefix sum") {
    val out = Compaction.plan(units, "part", "rows", targetRows = 100L)
      .orderBy("unit").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("p00", 0L, 0L), ("p01", 40L, 0L), ("p02", 80L, 0L),
      ("p03", 120L, 1L), ("p04", 130L, 1L), ("p05", 280L, 2L)))
  }

  test("planSummary rolls groups up with fill ratios") {
    val out = Compaction.planSummary(units, "part", "rows", targetRows = 100L)
      .orderBy("group_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 3L, 120L), (1L, 2L, 160L), (2L, 1L, 5L)))
  }

  test("empty input yields an empty plan, not a failure") {
    val empty = Seq.empty[(String, Long)].toDF("part", "rows")
    assert(Compaction.plan(empty, "part", "rows", 10L).count() === 0L)
  }
}
