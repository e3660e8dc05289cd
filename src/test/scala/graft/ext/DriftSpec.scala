package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "same", "en"), (2L, "gone", "en"), (3L, "was-this", "en"))
      .toDF("doc_id", "text", "lang")
    val newSnap = Seq(
      (1L, "same", "en"), (3L, "now-this", "en"), (4L, "brand-new", "de"))
      .toDF("doc_id", "text", "lang")
    val out = Drift.snapshotDiff(oldSnap, newSnap, "doc_id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "unchanged", 2L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff: a payload-column change alone flips status to changed") {
    import spark.implicits._
    val o = Seq((1L, "txt", "en")).toDF("doc_id", "text", "lang")
    val n = Seq((1L, "txt", "de")).toDF("doc_id", "text", "lang")
    val st = Drift.snapshotDiff(o, n, "doc_id", Seq("text", "lang"))
      .collect().head.getString(1)
    assert(st === "changed")
    // and excluding the changed column reports unchanged
    val st2 = Drift.snapshotDiff(o, n, "doc_id", Seq("text"))
      .collect().head.getString(1)
    assert(st2 === "unchanged")
  }

  test("distributionDrift: exact cross-multiplied numerators, keys from both sides") {
    import spark.implicits._
    val ref = Seq("a", "a", "a", "b").toDF("k")
    val cur = Seq("a", "a", "b", "b", "c").toDF("k")
    val rows = Drift.distributionDrift(ref, cur, "k").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    // t_ref=4, t_cur=5; drift = |n_ref*5 - n_cur*4|
    assert(rows === Map(
      "a" -> ((3L, 2L, 7L)),
      "b" -> ((1L, 2L, 3L)),
      "c" -> ((0L, 1L, 4L))))
  }

  test("schemaDiff classifies added/removed/type_changed/unchanged columns") {
    import spark.implicits._
    val a = Seq(
      ("t1", "c1", "bigint"), ("t1", "c2", "string"), ("t2", "c1", "double"))
      .toDF("tableName", "columnName", "dataType")
    val b = Seq(
      ("t1", "c1", "bigint"), ("t1", "c2", "varchar"), ("t1", "c3", "int"))
      .toDF("tableName", "columnName", "dataType")
    val out = Drift.schemaDiff(a, b).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(out === Map(
      ("t1", "c1") -> "unchanged",
      ("t1", "c2") -> "type_changed",
      ("t1", "c3") -> "added",
      ("t2", "c1") -> "removed"))
  }

  test("distributionDrift: identical snapshots drift to zero everywhere") {
    import spark.implicits._
    val d = Seq("x", "y", "y").toDF("k")
    val rows = Drift.distributionDrift(d, d, "k").collect()
    assert(rows.forall(_.getLong(5) === 0L))
    assert(rows.forall(r => r.getDouble(3) === r.getDouble(4)))
  }

  test("driftSummary: closed-form TVD and worst key; zero for identical mixes") {
    import spark.implicits._
    val ref = Seq("a", "a", "a", "b").toDF("k")
    val cur = Seq("a", "a", "b", "b", "c").toDF("k")
    val s = Drift.driftSummary(Drift.distributionDrift(ref, cur, "k")).collect().head
    assert(s.getAs[Long]("n_keys") === 3L)
    // drift_nums 7,3,4 over t_ref=4, t_cur=5 → TVD = 14/40 = 0.35
    assert(s.getAs[Double]("tvd") === 0.35)
    assert(s.getAs[String]("worst_key") === "a")
    assert(s.getAs[Long]("worst_drift_num") === 7L)
    val same = Seq("x", "y").toDF("k")
    val z = Drift.driftSummary(Drift.distributionDrift(same, same, "k")).collect().head
    assert(z.getAs[Double]("tvd") === 0.0)
  }

  test("numericDrift: identical distributions zero, shifted mass surfaces per bucket") {
    import spark.implicits._
    val ref = Seq(5.0, 15.0, 15.0, 25.0).toDF("v") // buckets 0,1,1,2 of width 10
    val same = Drift.numericDrift(ref, ref, "v", 0.0, 40.0, 4)
      .select("drift_num").collect().map(_.getLong(0))
    assert(same.forall(_ === 0L))
    val cur = Seq(5.0, 5.0, 15.0, 35.0).toDF("v") // buckets 0,0,1,3
    val rep = Drift.numericDrift(ref, cur, "v", 0.0, 40.0, 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    // totals 4 and 4: drift_num = |n_ref·4 − n_cur·4|
    assert(rep(0L) === ((1L, 2L, 4L)))
    assert(rep(1L) === ((2L, 1L, 4L)))
    assert(rep(2L) === ((1L, 0L, 4L)))
    assert(rep(3L) === ((0L, 1L, 4L)))
    // the composed one-row gate works on bucket keys too (numeric worst_key)
    val s = Drift.driftSummary(
      Drift.numericDrift(ref, cur, "v", 0.0, 40.0, 4)).collect().head
    assert(s.getAs[Long]("n_keys") === 4L)
    assert(s.getAs[Double]("tvd") === 0.5)
  }

  test("rollingMadAnomalies: spike flagged, warm-up suppressed, median/mad exact") {
    import spark.implicits._
    // steady 10s with one 100 spike at t=16; alternate key never spikes
    val rows = (1 to 20).map(t => ("a", t.toLong, if (t == 16) 100L else 10L)) ++
      (1 to 20).map(t => ("b", t.toLong, (10 + (t % 2)).toLong))
    val out = Drift.rollingMadAnomalies(
      rows.toDF("k", "t", "n"), "k", "t", "n",
      window = 8, k = 3, minWindow = 6)
    val byRow = out.collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(byRow(("a", 16L)) === ((10.0, 0.0, true)))   // spike vs flat window
    assert(byRow(("a", 10L)) === ((10.0, 0.0, false)))  // steady state
    assert(byRow(("a", 3L))._3 === false)               // warm-up: nw < 6
    // key b: alternating 10/11 — MAD 0.5, |x-med| at most 0.5 → never flagged
    assert((1 to 20).forall(t => !byRow(("b", t.toLong))._3))
    // after the spike leaves nothing: t=17 window contains the spike but
    // median stays 10 (robustness) and x=10 is not anomalous
    assert(byRow(("a", 17L)) === ((10.0, 0.0, false)))
  }

  test("ewmaSmooth: dyadic weights, warm-up zeros, steady state equals the input") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 7L), ("a", 2L, 7L), ("a", 3L, 7L), // steady series
      ("b", 1L, 1L), ("b", 2L, 2L), ("b", 3L, 4L))
      .toDF("k", "t", "x")
    val out = Drift.ewmaSmooth(df, "k", "t", "x", window = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("ewma_num"), r.getAs[Long]("smoothed")))).toMap
    // weights (current-first) 4,2,1; mass 7
    assert(out(("a", 1L)) === ((28L, 4L))) // 7·4, leading gap weighs 0
    assert(out(("a", 2L)) === ((42L, 6L))) // 7·4 + 7·2
    assert(out(("a", 3L)) === ((49L, 7L))) // steady state == input
    assert(out(("b", 3L)) === ((4L * 4 + 2 * 2 + 1, 3L))) // 21 div 7
  }

  test("schemaMerge widens numerics both directions, conflicts otherwise") {
    import spark.implicits._
    val a = Seq(
      ("t", "same", "string"), ("t", "widen_up", "int"),
      ("t", "widen_down", "bigint"), ("t", "clash", "double"),
      ("t", "gone", "int"))
      .toDF("tableName", "columnName", "dataType")
    val b = Seq(
      ("t", "same", "string"), ("t", "widen_up", "bigint"),
      ("t", "widen_down", "int"), ("t", "clash", "decimal(12,2)"),
      ("t", "fresh", "double"))
      .toDF("tableName", "columnName", "dataType")
    val out = Drift.schemaMerge(a, b).collect()
      .map(r => r.getString(1) -> ((r.getString(2), r.getString(5)))).toMap
    assert(out("same") === (("unchanged", "string")))
    assert(out("widen_up") === (("widened", "bigint"))) // new side wins
    assert(out("widen_down") === (("widened", "bigint"))) // old side wins
    assert(out("clash") === (("conflict", ""))) // decimal off the ladder
    assert(out("gone") === (("old_only", "int"))) // union keeps it
    assert(out("fresh") === (("added", "double")))
  }

  test("ksDrift: identical distribution scores 0, shifted distribution scores high") {
    import spark.implicits._
    // a and b identical; c shifted far right
    val df = (
      (1 to 50).map(i => ("a", (i % 10).toLong)) ++
      (1 to 50).map(i => ("b", (i % 10).toLong)) ++
      (1 to 50).map(i => ("c", 100L + (i % 10)))
    ).toDF("src", "v")
    val out = Drift.ksDrift(df, "v", "src").collect()
      .map(r => r.getAs[String]("src") ->
        ((r.getAs[Long]("n_g"), r.getAs[Long]("ks_num"), r.getAs[Long]("ks_den"),
          r.getAs[Long]("ks_fp")))).toMap
    // c vs rest: complete separation → KS = 1 → ks_fp = 2^20
    assert(out("c")._4 === 1048576L)
    assert(out("c")._2 === out("c")._3)
    // a vs rest (b identical, c disjoint): sup at v=9 where F_a=1, F_rest=1/2
    // → |50·100 − 50·50| = 2500, den = 50·100 = 5000 → KS = 1/2
    assert(out("a")._4 === 1048576L / 2L)
    assert(out("a") === out("b"))
  }

  test("ksDrift: brute-force cross-check on an irregular fixture") {
    import spark.implicits._
    val rows = Seq(("x", 1L), ("x", 2L), ("x", 2L), ("x", 7L),
      ("y", 2L), ("y", 5L), ("y", 5L), ("y", 9L), ("y", 9L))
    val out = Drift.ksDrift(rows.toDF("src", "v"), "v", "src").collect()
      .map(r => r.getAs[String]("src") -> r.getAs[Long]("ks_num")).toMap
    // brute force: for each group, sup over all values of
    // |cum_g·n_rest − cum_rest·n_g|
    val all = rows.map(_._2)
    for (g <- Seq("x", "y")) {
      val mine = rows.filter(_._1 == g).map(_._2)
      val rest = rows.filter(_._1 != g).map(_._2)
      val sup = all.distinct.map { v =>
        math.abs(mine.count(_ <= v).toLong * rest.size - rest.count(_ <= v).toLong * mine.size)
      }.max
      assert(out(g) === sup, s"group $g")
    }
  }

  test("cardinalityDrift: exact per-half distincts with nulls counted; dev matches definition") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val df = (1L to 200L).map { i =>
      (i, i % 7, if (i % 5 == 0) null.asInstanceOf[String] else s"v${i % 3}")
    }.toDF("id", "num", "str")
    val out = Drift.cardinalityDrift(df, "id", Seq("num", "str")).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    // replay the halves with the same hash
    val half = pmod(graft.ext.Dedup.stableHash(col("id").cast("string"), 3), lit(2L))
    val rows = df.withColumn("h", half).collect()
      .map(r => (r.getAs[Long]("h"), r.getAs[Long]("num"), r.getAs[String]("str")))
    Seq("num", "str").foreach { c =>
      val r = out(c)
      val aRows = rows.filter(_._1 == 0L)
      val bRows = rows.filter(_._1 == 1L)
      assert(r.getAs[Long]("n_a") === aRows.length.toLong)
      assert(r.getAs[Long]("n_b") === bRows.length.toLong)
      def d(xs: Array[(Long, Long, String)]) =
        (if (c == "num") xs.map(_._2.toString) else xs.map(x => String.valueOf(x._3)))
          .distinct.length.toLong // String.valueOf(null) = "null": null counts
      assert(r.getAs[Long]("d_a") === d(aRows), s"$c d_a")
      assert(r.getAs[Long]("d_b") === d(bRows), s"$c d_b")
      assert(r.getAs[Long]("dev_num") ===
        math.abs(r.getAs[Long]("d_a") * r.getAs[Long]("n_b") -
          r.getAs[Long]("d_b") * r.getAs[Long]("n_a")))
    }
  }

  test("changePoint: CUSUM peak lands at the hand-computed regime shift") {
    import spark.implicits._
    val hourNs = 3600L * 1000000000L
    // type "a": hourly counts [1,1,1,9,9] — prefix sums 1,2,3,12,21 vs
    // uniform: |S_r·5 − r·21| = 16,32,48,24 → split at position 3
    val a = (0 until 5).flatMap { h =>
      val n = if (h < 3) 1 else 9
      Seq.fill(n)(("a", (h + 1).toLong * hourNs + 1L))
    }
    // type "b": one bucket only — no interior split, no row
    val b = Seq(("b", 1L * hourNs + 1L))
    val events = (a ++ b).toDF("event_type", "ts")
    val out = Drift.changePoint(events).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("event_type") === "a")
    assert(r.getAs[Long]("n_buckets") === 5L)
    assert(r.getAs[Long]("n_events") === 21L)
    assert(r.getAs[Long]("split_pos") === 3L)
    assert(r.getAs[Long]("split_bucket") === 3L)
    assert(r.getAs[Long]("d_num") === 48L)
  }
}
