package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("as-of semantics: latest prior row, <= ties, null when none") {
    import spark.implicits._
    val quotes = Seq( // (key, ts, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "ts", "px")
    val trades = Seq( // (key, ts, qty)
      ("A", 25L, 100L), // between quotes 20 and 30 → px 2.0
      ("A", 20L, 200L), // exactly at quote 20 → <= includes it → 2.0
      ("A", 5L, 300L),  // before any quote → null
      ("B", 99L, 400L), // latest B quote 15 → 9.0
      ("C", 50L, 500L)) // no quotes at all → null
      .toDF("sym", "ts", "qty")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts", "ts", Seq("px"))
      .select("sym", "ts", "qty", "asof_px").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toSet
    assert(out === Set(
      ("A", 25L, 100L, Some(2.0)),
      ("A", 20L, 200L, Some(2.0)),
      ("A", 5L, 300L, None),
      ("B", 99L, 400L, Some(9.0)),
      ("C", 50L, 500L, None)))
  }

  test("as-of plan has no join operator — one shuffle on the key") {
    import spark.implicits._
    val l = Seq(("A", 1L, 1L)).toDF("k", "ts", "v")
    val r = Seq(("A", 1L, 2.0)).toDF("k", "ts", "p")
    val plan = AsOfJoin.asOf(l, r, "k", "ts", "ts", Seq("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should be join-free:\n$plan")
    assert(plan.contains("Window"))
  }
}
