package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  test("gram overlap ratios, short-doc whole-text grams, flag threshold") {
    import spark.implicits._
    val bench = Seq((100L, "a b c d"), (101L, "zz")).toDF("doc_id", "text")
    val cands = Seq(
      (1L, "a b c x"), // trigrams {a b c, b c x}: 1 of 2 hit → 0.5
      (2L, "p q r s"), // no overlap → 0.0
      (3L, "zz"), //       short doc, verbatim benchmark copy → 1.0
      (4L, "b c d a b c")) // {b c d, c d a, d a b, a b c}: 2 of 4 → 0.5
      .toDF("doc_id", "text")
    val out = Decontaminate.contamination(cands, bench, n = 3, threshold = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, 2L, 1L, 0.5, true),
      (2L, 2L, 0L, 0.0, false),
      (3L, 1L, 1L, 1.0, true),
      (4L, 4L, 2L, 0.5, true)))
  }

  test("benchmark side broadcasts: corpus never shuffles for the probe") {
    import spark.implicits._
    val bench = Seq((1L, "a b c")).toDF("doc_id", "text")
    val cands = Seq((2L, "a b c")).toDF("doc_id", "text")
    val plan = Decontaminate.contamination(cands, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
