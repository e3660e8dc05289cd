package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- Bloom ----------------

  test("bloom: no false negatives, pruning precedes the exact join") {
    val build = (1L to 50L).map(i => i * 7).toDF("k")
    val probe = (1L to 1000L).toDF("k")
    val bloom = Sketches.bloomBuild(build, "k", m = 256, k = 3)
    val pruned = Sketches.bloomPrune(probe, "k", bloom, m = 256, k = 3)
    val passed = pruned.select("k").as[Long].collect().toSet
    // every true member passes (bloom guarantee)
    (1L to 50L).map(_ * 7).filter(_ <= 1000).foreach(m => assert(passed.contains(m)))
    // the filter actually prunes (some non-members rejected)
    assert(passed.size < 1000)
    // prune + exact join == exact join (false positives are removed by the join)
    val viaBloom = pruned.join(build.withColumnRenamed("k", "bk"),
      col("k") === col("bk"), "left_semi").as[Long].collect().sorted
    val direct = probe.join(build.withColumnRenamed("k", "bk"),
      col("k") === col("bk"), "left_semi").as[Long].collect().sorted
    assert(viaBloom.toSeq === direct.toSeq)
  }

  test("bloom: build state is mergeable and bounded by m") {
    val a = (1L to 400L).toDF("k")
    val b = (300L to 700L).toDF("k")
    val merged = Sketches.bloomBuild(a, "k", 128, 3)
      .union(Sketches.bloomBuild(b, "k", 128, 3)).distinct()
    val whole = Sketches.bloomBuild(a.union(b), "k", 128, 3)
    assert(merged.as[Long].collect().sorted.toSeq ===
      whole.as[Long].collect().sorted.toSeq)
    assert(whole.count() <= 128)
  }

  test("bloom: probe plan broadcasts the filter and keeps the probe unshuffled") {
    val build = (1L to 50L).toDF("k")
    val probe = (1L to 1000L).toDF("k")
    val bloom = Sketches.bloomBuild(build, "k", 256, 3)
    val plan = Sketches.bloomPrune(probe, "k", bloom, 256, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  // ---------------- Count–min ----------------

  test("cms: estimates never underestimate and match exact for heavy items") {
    val items = Seq.fill(500)("alpha") ++ Seq.fill(200)("beta") ++
      (1 to 300).map(i => s"tail$i")
    val df = items.toDF("item")
    val sketch = Sketches.cmsBuild(df, "item", depth = 4, width = 512)
    val exact = df.groupBy("item").count()
    val est = Sketches.cmsEstimate(exact.select("item"), "item", sketch, 4, 512)
      .withColumnRenamed("cms_estimate", "est")
    val joined = exact.join(est, "item")
      .select($"item", $"count", $"est").collect()
    joined.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"underestimate for ${r.getString(0)}")
    }
    // sketch is bounded
    assert(sketch.count() <= 4 * 512)
    // heavy hitters dominate their cells: estimate exact at this load factor
    val heavy = joined.filter(r => r.getString(0) == "alpha").head
    assert(heavy.getLong(2) - heavy.getLong(1) < 10)
  }

  test("cms: merge of shard sketches equals the whole-corpus sketch") {
    val a = (Seq.fill(100)("x") ++ Seq.fill(50)("y")).toDF("item")
    val b = (Seq.fill(30)("y") ++ Seq.fill(70)("z")).toDF("item")
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuild(a, "item", 4, 64), Sketches.cmsBuild(b, "item", 4, 64))
    val whole = Sketches.cmsBuild(a.union(b), "item", 4, 64)
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m === w)
  }

  // ---------------- HLL ----------------

  test("hll: estimate within 20% of exact, registers mergeable") {
    val df = (1L to 5000L).toDF("k")
    val regs = Sketches.hllRegisters(df, "k", m = 64)
    assert(regs.count() <= 64)
    val est = Sketches.hllEstimate(regs, 64)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.2, s"estimate $est")
    // register-max merge of two halves == whole-corpus registers
    val left = Sketches.hllRegisters((1L to 2500L).toDF("k"), "k", 64)
    val right = Sketches.hllRegisters((2000L to 5000L).toDF("k"), "k", 64)
    val merged = Sketches.hllMerge(left, right).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = regs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === whole)
  }

  test("hll: duplicate-insensitive (set semantics)") {
    val once = (1L to 1000L).toDF("k")
    val thrice = ((1L to 1000L) ++ (1L to 1000L) ++ (1L to 1000L)).toDF("k")
    val a = Sketches.hllRegisters(once, "k", 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sketches.hllRegisters(thrice, "k", 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("per-group registers slice like per-group builds; engine-side raw estimate tracks exact") {
    import spark.implicits._
    val df = ((1L to 800L).map(i => ("g1", i)) ++ (1L to 50L).map(i => ("g2", i * 7)))
      .toDF("grp", "k")
    val by = Sketches.hllRegistersBy(df, "grp", "k", 64)
    // group slice == independent single-group build
    val g1Only = Sketches.hllRegisters(df.filter($"grp" === "g1"), "k", 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val g1Slice = by.filter($"grp" === "g1").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(g1Slice === g1Only)
    // engine-side raw estimate: matches the driver-side harmonic estimate
    // (same alpha, same registers) and lands within HLL's error envelope
    val est = Sketches.hllRawEstimateBy(by, "grp", 64).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val driverEst = Sketches.hllEstimate(
      by.filter($"grp" === "g1").drop("grp"), 64)
    assert(math.abs(est("g1") - driverEst) < 1e-4)
    assert(math.abs(est("g1") - 800.0) / 800.0 < 0.25, s"g1 estimate ${est("g1")}")
  }

  test("hllSetOps: inclusion-exclusion tracks true overlap; edges behave") {
    import spark.implicits._
    def regs(lo: Long, hi: Long) = Sketches.hllRegisters(
      (lo until hi).toDF("k"), "k", 64)
    // A = [0, 1000), B = [500, 1500): |A∩B| = 500, J = 1/3
    val out = Sketches.hllSetOps(regs(0, 1000), regs(500, 1500), 64).collect().head
    val (ea, eb, eu, ei, j) = (out.getDouble(0), out.getDouble(1),
      out.getDouble(2), out.getDouble(3), out.getDouble(4))
    assert(math.abs(ea - 1000) / 1000 < 0.25, s"est_a $ea")
    assert(math.abs(eu - 1500) / 1500 < 0.25, s"est_union $eu")
    assert(math.abs(ei - 500) / 500 < 0.5, s"est_intersection $ei")
    assert(j > 0.15 && j < 0.55, s"jaccard $j")
    // identical sets: union == each side, jaccard 1
    val same = Sketches.hllSetOps(regs(0, 800), regs(0, 800), 64).collect().head
    assert(same.getDouble(0) === same.getDouble(2))
    assert(same.getDouble(3) === same.getDouble(0))
    assert(same.getDouble(4) === 1.0)
    // disjoint sets: the estimate may dip negative — clamped at 0
    val dis = Sketches.hllSetOps(regs(0, 500), regs(10000, 10500), 64).collect().head
    assert(dis.getDouble(3) >= 0.0)
    assert(dis.getDouble(3) / dis.getDouble(2) < 0.2, "disjoint intersection share")
  }

  test("hllColumnAudit: exact counts right, sketch ratio sane at sketch scale") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong % 3, i.toLong)).toDF("small", "wide")
    val out = Sketches.hllColumnAudit(df, Seq("small", "wide"))
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(out("small").getAs[Long]("exact_distinct") === 3L)
    assert(out("wide").getAs[Long]("exact_distinct") === 1000L)
    // 3 keys fill at most 3 of 64 registers — the raw estimate is known
    // to need the linear-counting correction there, which is why
    // n_zero_registers is part of the report
    assert(out("small").getAs[Long]("n_zero_registers") >= 61L)
    // at sketch scale the raw estimate is within HLL's error regime
    val ratio = out("wide").getAs[Double]("est_ratio")
    assert(ratio > 0.5 && ratio < 2.0, s"wide est_ratio $ratio")
    assert(out("wide").getAs[Double]("raw_estimate") > 0.0)
  }

  test("hllColumnAudit: an all-null column still reports, with null estimate fields") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, Option.empty[String])).toDF("id", "dead")
    val out = Sketches.hllColumnAudit(df, Seq("id", "dead"))
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    // "not audited" and "all null" must be distinguishable: the value-less
    // column appears with exact_distinct = 0, all registers zero, and null
    // estimate/ratio (no divide-by-zero)
    assert(out.keySet === Set("id", "dead"))
    assert(out("dead").getAs[Long]("exact_distinct") === 0L)
    assert(out("dead").getAs[Long]("n_zero_registers") === 64L)
    assert(out("dead").isNullAt(out("dead").fieldIndex("raw_estimate")))
    assert(out("dead").isNullAt(out("dead").fieldIndex("est_ratio")))
    assert(out("id").getAs[Long]("exact_distinct") === 50L)
  }

  test("cmsErrorProfile: wide sketch is collision-free; tight sketch shows the overestimate mass") {
    import spark.implicits._
    val items = (1 to 500).flatMap(i => Seq.fill(i % 7 + 1)(s"item$i")).toDF("it")
    // width >> vocabulary: every estimate is exact — a single bucket-0 row
    val wide = Sketches.cmsErrorProfile(items, "it", depth = 4, width = 1 << 20)
      .collect()
    assert(wide.length === 1)
    assert(wide.head.getAs[Long]("err_bucket") === 0L)
    assert(wide.head.getAs[Long]("n_items") === 500L)
    assert(wide.head.getAs[Long]("sum_err") === 0L)
    // width << vocabulary: collisions must appear, errors stay one-sided
    val tight = Sketches.cmsErrorProfile(items, "it", depth = 2, width = 64)
      .collect()
    assert(tight.map(_.getAs[Long]("n_items")).sum === 500L,
      "every distinct item lands in exactly one error bucket")
    assert(tight.exists(r => r.getAs[Long]("err_bucket") > 0L),
      "a 64-cell sketch over 500 items must collide")
    tight.foreach { r =>
      val (b, mx) = (r.getAs[Long]("err_bucket"), r.getAs[Long]("max_err"))
      assert(mx >= 0L)
      if (b > 0L) assert(mx < (1L << b.toInt) && mx >= (1L << (b.toInt - 1)),
        s"bucket $b must hold bit-length-$b errors, got max $mx")
    }
  }
}
