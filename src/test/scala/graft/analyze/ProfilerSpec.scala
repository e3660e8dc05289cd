package graft.analyze

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {

  test("numericProfile: counts, nulls, distinct, range, mean per column in one row each") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, 10.0), (3.0, null), (2.0, 30.0))
      .toDF("a", "b")
    val out = Profiler.numericProfile(df, Seq("a", "b")).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") === 4L)
    assert(a.getAs[Long]("n_null") === 0L)
    assert(a.getAs[Long]("n_distinct") === 3L)
    assert(a.getAs[Double]("min_v") === 1.0)
    assert(a.getAs[Double]("max_v") === 3.0)
    assert(a.getAs[Double]("mean_v") === 2.0)
    val b = out("b")
    assert(b.getAs[Long]("n") === 3L)
    assert(b.getAs[Long]("n_null") === 1L)
    assert(b.getAs[Long]("n_distinct") === 2L)
    assert(b.getAs[Double]("mean_v") === 50.0 / 3)
  }

  test("approxNumericProfile: exact fields identical, distinct within sketch error") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toDouble, (i % 37).toDouble)).toDF("a", "b")
    val exact = Profiler.numericProfile(df, Seq("a", "b")).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val approx = Profiler.approxNumericProfile(df, Seq("a", "b")).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    Seq("a", "b").foreach { c =>
      // everything but n_distinct is the same exact aggregation
      Seq("n", "n_null").foreach(f =>
        assert(approx(c).getAs[Long](f) === exact(c).getAs[Long](f), s"$c.$f"))
      Seq("min_v", "max_v", "mean_v").foreach(f =>
        assert(approx(c).getAs[Double](f) === exact(c).getAs[Double](f), s"$c.$f"))
      // HLL++ at rsd 2.3%: allow 10% slack on the estimate
      val (d, e) = (approx(c).getAs[Long]("n_distinct").toDouble,
        exact(c).getAs[Long]("n_distinct").toDouble)
      assert(math.abs(d - e) / e <= 0.1, s"$c distinct estimate $d vs exact $e")
    }
  }

  test("profileAuto: routes by footer row count, both routes share one schema") {
    val cols = Seq("l_quantity", "l_discount")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    // the row limit flips the route: each side must reproduce its target
    // path's output exactly (the deterministic proof of which path ran)
    val viaExact = Profiler.profileAuto(spark, sf0001, "lineitem", cols,
      exactRowLimit = Long.MaxValue)
    val viaApprox = Profiler.profileAuto(spark, sf0001, "lineitem", cols,
      exactRowLimit = 0L)
    assert(viaExact.schema === viaApprox.schema,
      "callers must be able to switch routes without schema changes")
    assert(rows(viaExact) === rows(Profiler.numericProfile(li, cols)))
    assert(rows(viaApprox) === rows(Profiler.approxNumericProfile(li, cols)))
  }

  test("percentilesAuto: routes by footer row count, both routes share one schema") {
    val ps = Seq(0.25, 0.5, 0.75)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val viaExact = Profiler.percentilesAuto(spark, sf0001, "lineitem",
      "l_quantity", ps, exactRowLimit = Long.MaxValue)
    val viaApprox = Profiler.percentilesAuto(spark, sf0001, "lineitem",
      "l_quantity", ps, exactRowLimit = 0L)
    assert(viaExact.schema === viaApprox.schema,
      "callers must be able to switch routes without schema changes")
    assert(rows(viaExact) === rows(Profiler.percentiles(li, "l_quantity", ps)))
    assert(rows(viaApprox) ===
      rows(Profiler.approxPercentiles(li, "l_quantity", ps)))
    // at sketch accuracy 10k on ~6k rows the estimate is rank-exact or
    // adjacent: each approx value must be within the exact p±0.01 band
    val exact = Profiler.percentiles(li, "l_quantity", Seq(0.24, 0.25, 0.26, 0.49, 0.5, 0.51, 0.74, 0.75, 0.76))
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("value")).toMap
    val approx = viaApprox.collect()
      .map(r => r.getAs[Double]("p") -> r.getAs[Double]("value")).toMap
    ps.foreach { p =>
      val (lo, hi) = (exact(p - 0.01) min exact(p + 0.01), exact(p - 0.01) max exact(p + 0.01))
      assert(approx(p) >= lo && approx(p) <= hi,
        s"approx p=$p value ${approx(p)} outside [$lo, $hi]")
    }
  }

  test("percentiles: PERCENTILE_CONT interpolation on a known set") {
    import spark.implicits._
    val df = Seq(10.0, 20.0, 30.0, 40.0).toDF("x")
    val out = Profiler.percentiles(df, "x", Seq(0.0, 0.5, 0.25, 1.0))
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("value")).toMap
    assert(out(0.0) === 10.0)
    assert(out(0.5) === 25.0) // idx 1.5 → 20 + 0.5·(30−20)
    assert(out(0.25) === 17.5) // idx 0.75 → 10 + 0.75·(20−10)
    assert(out(1.0) === 40.0)
  }

  test("histogram: clamps out-of-range values into edge buckets, skips nulls") {
    import spark.implicits._
    val df = Seq[java.lang.Double](-5.0, 0.0, 4.9, 5.0, 9.9, 10.0, 25.0, null)
      .toDF("x")
    val out = Profiler.histogram(df, "x", lo = 0.0, hi = 10.0, nBuckets = 2)
      .collect().map(r => r.getAs[Int]("bucket") ->
        (r.getAs[Long]("n"), r.getAs[Double]("lo_v"), r.getAs[Double]("hi_v"))).toMap
    // bucket 0 [0,5): -5 (clamped), 0, 4.9 ; bucket 1 [5,10): 5, 9.9, 10, 25 (clamped)
    assert(out(0)._1 === 3L)
    assert(out(1)._1 === 4L)
    assert(out(0)._2 === 0.0 && out(0)._3 === 5.0)
    assert(out(1)._2 === 5.0 && out(1)._3 === 10.0)
  }

  test("quantile sketch: estimates within one bin width of exact, mergeable") {
    import spark.implicits._
    val values = (1 to 10000).map(_.toDouble)
    val df = values.toDF("x")
    val sketch = Profiler.histogram(df, "x", lo = 0.0, hi = 10000.0, nBuckets = 100)
    val est = Profiler.quantileEstimate(sketch, Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("est")).toMap
    val binWidth = 100.0
    Seq(0.5 -> 5000.0, 0.9 -> 9000.0, 0.99 -> 9900.0).foreach { case (p, exact) =>
      assert(math.abs(est(p) - exact) <= binWidth, s"p=$p est=${est(p)}")
    }
    // shard-and-merge == whole-corpus sketch (the distributed/incremental path)
    val left = Profiler.histogram(values.take(6000).toDF("x"), "x", 0.0, 10000.0, 100)
    val right = Profiler.histogram(values.drop(6000).toDF("x"), "x", 0.0, 10000.0, 100)
    val merged = Profiler.histogramMerge(left, right)
    val mergedEst = Profiler.quantileEstimate(merged, Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("est")).toMap
    assert(mergedEst === est)
  }

  test("robustScale: closed-form median/IQR z, constant column scales to zero") {
    import spark.implicits._
    // values 0..4: p25=1, med=2, p75=3, IQR=2
    val df = (0 to 4).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Profiler.robustScale(df, "v", "id").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("robust_z")).toMap
    assert(out === Map(0L -> -1.0, 1L -> -0.5, 2L -> 0.0, 3L -> 0.5, 4L -> 1.0))
    val const = Seq((1L, 7.0), (2L, 7.0), (3L, 7.0)).toDF("id", "v")
    assert(Profiler.robustScale(const, "v", "id").collect()
      .forall(_.getAs[Double]("robust_z") === 0.0))
  }

  test("joinCardinality: predicted size equals the actual join, skew surfaces as max_key_rows") {
    import spark.implicits._
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")   // key 1 ×3
    val r = Seq(1L, 1L, 2L, 4L).toDF("k")       // key 1 ×2
    val row = Profiler.joinCardinality(l, "k", r, "k").collect().head
    assert(row.getAs[Long]("n_left") === 5L)
    assert(row.getAs[Long]("n_right") === 4L)
    assert(row.getAs[Long]("n_keys_left") === 3L)
    assert(row.getAs[Long]("n_keys_right") === 3L)
    assert(row.getAs[Long]("n_common_keys") === 2L)
    val actual = l.join(r, Seq("k")).count()
    assert(row.getAs[Long]("join_rows") === actual) // 3·2 + 1·1 = 7
    assert(row.getAs[Long]("max_key_rows") === 6L)  // the hot key
  }

  test("keySkewProfile: exact Gini via counts-of-counts matches the rank formula") {
    import spark.implicits._
    // per-key counts: a→1, b→3 ⇒ Gini((1,3)) = 2/(2·4) = 0.25
    val df = (Seq("a") ++ Seq.fill(3)("b")).map(Tuple1(_)).toDF("k")
    val r = Profiler.keySkewProfile(df, "k").collect().head
    assert(r.getAs[Long]("n_keys") === 2L)
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Long]("max_key_rows") === 3L)
    assert(r.getAs[Double]("top_share") === 0.75)
    assert(r.getAs[Double]("gini") === 0.25)
    // uniform keys ⇒ Gini 0 (ties collapse into one frequency-value row)
    val uni = (1 to 30).map(i => s"k${i % 10}").map(Tuple1(_)).toDF("k")
    val u = Profiler.keySkewProfile(uni, "k").collect().head
    assert(u.getAs[Double]("gini") === 0.0)
    assert(u.getAs[Long]("n_keys") === 10L)
    // brute-force cross-check on an irregular distribution
    val counts = Seq(1, 1, 2, 5, 5, 5, 9)
    val irr = counts.zipWithIndex.flatMap { case (c, i) => Seq.fill(c)(s"k$i") }
      .map(Tuple1(_)).toDF("k")
    val n = counts.length
    val sorted = counts.sorted
    val gnum = sorted.zipWithIndex.map { case (x, i0) => (2 * (i0 + 1) - n - 1).toLong * x }.sum
    val expected = gnum.toDouble / (n.toDouble * counts.sum.toDouble)
    assert(Profiler.keySkewProfile(irr, "k").collect().head.getAs[Double]("gini") === expected)
  }

  test("grouped quantile sketch: per-group estimates within one bin width of exact") {
    import spark.implicits._
    // group a: 1..100 uniform; group b: 1..50 doubled (2,4,..,100)
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i * 2.0))).toDF("g", "v")
    val sketch = Profiler.histogramBy(df, "g", "v", 0.0, 100.0, 20)
    assert(sketch.groupBy("g").count().collect()
      .forall(_.getLong(1) <= 20L)) // sketch-scale state per group
    val est = Profiler.quantileEstimateBy(sketch, "g", Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(4)).toMap
    // exact p50/p90: a = 50/90 (rank 50, 90), b = 50/90 too (rank 25, 45)
    assert(math.abs(est(("a", 0.5)) - 50.0) <= 5.0)
    assert(math.abs(est(("a", 0.9)) - 90.0) <= 5.0)
    assert(math.abs(est(("b", 0.5)) - 50.0) <= 5.0)
    assert(math.abs(est(("b", 0.9)) - 90.0) <= 5.0)
    // per-group state merges like the global sketch: shard, merge, re-read
    val sh1 = Profiler.histogramBy(df.filter($"v" <= 40), "g", "v", 0.0, 100.0, 20)
    val sh2 = Profiler.histogramBy(df.filter($"v" > 40), "g", "v", 0.0, 100.0, 20)
    val merged = sh1.unionByName(sh2)
      .groupBy("g", "bucket", "lo_v", "hi_v")
      .agg(org.apache.spark.sql.functions.sum($"n").as("n"),
        org.apache.spark.sql.functions.sum($"sum_v").as("sum_v"))
    val est2 = Profiler.quantileEstimateBy(merged, "g", Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(4)).toMap
    assert(est2 === est)
  }

  test("exactRank equals SQL RANK() including ties; window sees only distinct values") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val df = (1 to 2000).map(i => (i.toLong, rnd.nextInt(40).toLong)).toDF("id", "v")
    val viaCounts = Profiler.exactRank(df, "v", "rk")
      .select($"id", $"rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaWindow = df.withColumn("rk", rank().over(Window.orderBy("v")))
      .select($"id", $"rk").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(viaCounts === viaWindow)
  }

  test("rankFusion sums per-signal exact ranks into an integer score") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 10L, 5L), (2L, 20L, 5L), (3L, 10L, 9L))
      .toDF("id", "a", "b")
    val out = Profiler.rankFusion(df, Seq("a", "b")).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rank_a"), r.getAs[Long]("rank_b"), r.getAs[Long]("fused_rank_sum"))))
      .toMap
    assert(out(1L) === ((1L, 1L, 2L))) // a ties at rank 1, b ties at rank 1
    assert(out(2L) === ((3L, 1L, 4L)))
    assert(out(3L) === ((1L, 3L, 4L)))
  }

  test("robustScaleBy: per-group median/IQR; constant group pins to zero") {
    import spark.implicits._
    val df = (
      Seq((1L, "a", 0L), (2L, "a", 10L), (3L, "a", 20L), (4L, "a", 30L), (5L, "a", 40L)) ++
      Seq((6L, "b", 7L), (7L, "b", 7L), (8L, "b", 7L))  // zero IQR
    ).toDF("id", "grp", "v")
    val out = Profiler.robustScaleBy(df, "v", "id", "grp").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("robust_z")).toMap
    // group a: med 20, p25 10, p75 30 → IQR 20
    assert(out(1L) === -1.0)
    assert(out(3L) === 0.0)
    assert(out(5L) === 1.0)
    // constant group: IQR 0 → defined as 0, not NaN/div-by-zero
    assert(out(6L) === 0.0 && out(8L) === 0.0)
    // the group boundary matters: the same value scales differently per group
    val mixed = Profiler.robustScaleBy(df, "v", "id", "grp")
      .filter($"id" === 2L).head().getAs[Double]("robust_z")
    assert(mixed === -0.5)
  }

  test("quantileNormalize: single group is the identity on values") {
    import spark.implicits._
    val df = Seq((1L, "a", 30L), (2L, "a", 10L), (3L, "a", 20L), (4L, "a", 20L))
      .toDF("id", "grp", "v")
    val out = Profiler.quantileNormalize(df, "v", "id", "grp").collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("qpos"), r.getAs[Long]("norm_value")))).toMap
    // r == qpos when n_grp == N, and position r holds the row's own value
    assert(out(2L) === ((1L, 10L)))
    assert(out(3L) === ((2L, 20L)))
    assert(out(4L) === ((3L, 20L)))
    assert(out(1L) === ((4L, 30L)))
  }

  test("trimmedMeanBy: trims both tails, exact fixed-point mean, tiny group untrimmed") {
    import spark.implicits._
    val df = (
      (1 to 10).map(i => (i.toLong, "a", i.toLong * 10)) ++     // 10,20,...,100
      Seq((11L, "b", 5L), (12L, "b", 100L))                     // too small to trim
    ).toDF("id", "grp", "v")
    val out = Profiler.trimmedMeanBy(df, "v", "id", "grp").collect()
      .map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("k_trim"), r.getAs[Long]("n_used"),
          r.getAs[Long]("sum_kept"), r.getAs[Long]("mean_fp")))).toMap
    // a: k=1, keep 20..90 → sum 440, mean 55 exactly
    assert(out("a") === ((10L, 1L, 8L, 440L, 55L * 1048576L)))
    // b: n=2, k would be 0 → untrimmed; mean 52.5 floors at fp
    assert(out("b") === ((2L, 0L, 2L, 105L, 105L * 1048576L / 2L)))
  }

  test("olsBy: exact slope/intercept on a perfect line and a degenerate x") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // y = 3x + 7 exactly → slope_fp = 3·2^20, intercept_fp = 7·2^20
    val line = Seq((1L, 10L), (2L, 13L), (3L, 16L), (4L, 19L))
      .map { case (x, y) => ("a", x, y) }.toDF("grp", "x", "y")
    val r = Profiler.olsBy(line, col("x"), col("y"), "grp").collect()(0)
    assert(r.getAs[Long]("slope_fp") === 3L * 1048576L)
    assert(r.getAs[Long]("intercept_fp") === 7L * 1048576L)
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("sum_x") === 10L)

    // constant x → zero variance → both report 0, not a crash
    val flat = Seq(("b", 5L, 1L), ("b", 5L, 9L)).toDF("grp", "x", "y")
    val rf = Profiler.olsBy(flat, col("x"), col("y"), "grp").collect()(0)
    assert(rf.getAs[Long]("slope_fp") === 0L && rf.getAs[Long]("intercept_fp") === 0L)

    // negative slope floors toward -∞ consistently: y = -2x + 100
    val neg = Seq(("c", 1L, 98L), ("c", 2L, 96L), ("c", 3L, 94L)).toDF("grp", "x", "y")
    val rn = Profiler.olsBy(neg, col("x"), col("y"), "grp").collect()(0)
    assert(rn.getAs[Long]("slope_fp") === -2L * 1048576L)
    assert(rn.getAs[Long]("intercept_fp") === 100L * 1048576L)
  }

  test("quantileNormalize: small group maps onto global order statistics") {
    import spark.implicits._
    // global sorted values: [1,2,3,4, 100,200] (a:1..4, b:100,200), N=6
    val df = Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "a", 4L),
      (5L, "b", 100L), (6L, "b", 200L)
    ).toDF("id", "grp", "v")
    val out = Profiler.quantileNormalize(df, "v", "id", "grp").collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("qpos"), r.getAs[Long]("norm_value")))).toMap
    // group b (n=2): r=1 → ceil(1·6/2)=3 → value 3; r=2 → 6 → value 200
    assert(out(5L) === ((3L, 3L)))
    assert(out(6L) === ((6L, 200L)))
    // group a (n=4): positions ceil(r·6/4) = 2,3,5,6 → values 2,3,100,200
    assert(out(1L) === ((2L, 2L)))
    assert(out(2L) === ((3L, 3L)))
    assert(out(3L) === ((5L, 100L)))
    assert(out(4L) === ((6L, 200L)))
  }

  test("winsorizeBy: clamps to the per-group [p05, p95] band with clip flags") {
    import spark.implicits._
    // group a: 1..100 -> p05 = 5.95, p95 = 95.05 (linear interpolation)
    val df = (1 to 100).map(i => (i.toLong, "a", i.toLong)).toDF("id", "grp", "v")
    val out = Profiler.winsorizeBy(df, "v", "id", "grp").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("winsorized"), r.getAs[Boolean]("clipped_lo"), r.getAs[Boolean]("clipped_hi")))).toMap
    assert(out(1L) === ((5.95, true, false)))
    assert(out(3L) === ((5.95, true, false)))
    assert(out(50L) === ((50.0, false, false)))
    assert(out(100L) === ((95.05, false, true)))
    assert(out.values.count(_._2) === 5)  // exactly v=1..5 clip low
    assert(out.values.count(_._3) === 5)  // exactly v=96..100 clip high
  }

  test("correlationMatrix: perfect, inverse, and independent pairs; zero-variance guarded") {
    import spark.implicits._
    // y = 2x (r = 1); z = −x (r = −1); w cycles independently of x;
    // k is constant (zero variance → r_fp = 0)
    val df = (1L to 100L).map(i =>
      (i.toDouble, 2.0 * i, -i.toDouble, (i % 2).toDouble, 5.0))
      .toDF("x", "y", "z", "w", "k")
    val out = Profiler.correlationMatrix(df, Seq("x", "y", "z", "w", "k")).collect()
      .map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b")) ->
        r.getAs[Long]("r_fp")).toMap
    assert(out.size === 10)
    // the double finish can sit one ulp off exact ±1 before the floor
    assert(math.abs(out(("x", "y")) - 1048576L) <= 2L)
    assert(math.abs(out(("x", "z")) + 1048576L) <= 2L)
    assert(math.abs(out(("y", "z")) + 1048576L) <= 2L)
    assert(math.abs(out(("x", "w"))) < 40000L, "near-zero correlation expected")
    assert(out(("x", "k")) === 0L, "constant column reports 0")
  }

  test("correlationBy: opposite-sign groups from one aggregation") {
    import spark.implicits._
    val df = ((1L to 50L).map(i => ("up", i.toDouble, 3.0 * i)) ++
      (1L to 50L).map(i => ("down", i.toDouble, -2.0 * i)) ++
      Seq(("flat", 1.0, 7.0), ("flat", 2.0, 7.0)))
      .toDF("g", "x", "y")
    val out = Profiler.correlationBy(df, "g", "x", "y").collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("r_fp")).toMap
    assert(math.abs(out("up") - 1048576L) <= 2L)
    assert(math.abs(out("down") + 1048576L) <= 2L)
    assert(out("flat") === 0L, "zero y-variance group reports 0")
  }

  test("dependenceAudit: perfectly dependent columns concentrate on the diagonal") {
    import spark.implicits._
    // b = a exactly: every item's a-quintile == its b-quintile, so all
    // off-diagonal cells are absent and diagonal dev_num = n_cell·N − row·col
    val df = (1L to 100L).map(i => (i, i)).toDF("a", "b")
    val out = Profiler.dependenceAudit(df, "a", "b", buckets = 5).collect()
    assert(out.length === 5, "only diagonal cells exist")
    out.foreach { r =>
      assert(r.getAs[Long]("a_bucket") === r.getAs[Long]("b_bucket"))
      assert(r.getAs[Long]("n_cell") === 20L)
      assert(r.getAs[Long]("row_n") === 20L)
      assert(r.getAs[Long]("col_n") === 20L)
      // 20·100 − 20·20 = 1600: maximal positive deviation from independence
      assert(r.getAs[Long]("dev_num") === 1600L)
    }
    // independent columns: a cycles 0..4, b cycles 0..1 on coprime strides
    val ind = (0L until 100L).map(i => (i % 5, i % 2)).toDF("a", "b")
    val indOut = Profiler.dependenceAudit(ind, "a", "b", buckets = 5).collect()
    assert(indOut.forall(_.getAs[Long]("dev_num") === 0L),
      "independent columns show zero deviation everywhere")
  }

}
