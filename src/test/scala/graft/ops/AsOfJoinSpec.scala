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

  test("null payload in the latest right row stays null; columns never mix rows") {
    import spark.implicits._
    // right rows: (10, px=1.0, sz=5) then (20, px=NULL, sz=7): a left row at
    // 25 must take (NULL, 7) from the ts=20 row — not leak px=1.0 from ts=10
    val quotes = Seq(
      ("A", 10L, Some(1.0), Some(5L)),
      ("A", 20L, None, Some(7L))).toDF("sym", "ts", "px", "sz")
    val trades = Seq(("A", 25L, 100L)).toDF("sym", "ts", "qty")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts", "ts", Seq("px", "sz")).collect().head
    assert(out.isNullAt(out.fieldIndex("asof_px")), "stale px leaked from an older right row")
    assert(out.getAs[Long]("asof_sz") === 7L)
  }

  test("bucketed as-of equals plain as-of under a hot key (50% of events)") {
    import spark.implicits._
    // one user owns half the left rows; right rows sprinkle across buckets
    val left = ((1 to 200).map(i => (1L, i.toLong * 10, i.toLong)) ++
      (1 to 200).map(i => ((i % 37 + 2).toLong, i.toLong * 10 + 5, 1000L + i)))
      .toDF("user_id", "ts", "ev")
    val right = (1 to 40).map(i => ((i % 5 + 1).toLong, i.toLong * 50, s"f$i"))
      .toDF("user_id", "ts", "feat")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "ts", "ev", "asof_feat").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), Option(r.get(3)))).toSet
    val plain = canon(AsOfJoin.asOf(left, right, "user_id", "ts", "ts", Seq("feat")))
    // width chosen so the hot key spans many buckets AND carries matter
    val bucketed = canon(
      AsOfJoin.asOfBucketed(left, right, "user_id", "ts", "ts", Seq("feat"), bucketWidth = 100L))
    assert(bucketed === plain)
    assert(plain.exists(_._4.isDefined))
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
