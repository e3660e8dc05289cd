package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("bins follow the global cumulative offset; straddlers keep start bin") {
    import spark.implicits._
    // weights 60,60,60: doc 2 starts at offset 60 (bin 0), doc 3 at 120
    // (bin 1, capacity 100) — doc 2 straddles and stays in bin 0
    val docs = Seq((1L, 60L), (2L, 60L), (3L, 60L)).toDF("doc_id", "w")
    val out = Packing.packGreedy(docs, "doc_id", "w", capacity = 100L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((0L, 2L, 120L, 1.2), (1L, 1L, 60L, 0.6)))
  }

  test("distributed prefix sum equals the single-window cumsum") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i * 7 % 997, (i * 13 % 50) + 1))
      .distinctBy(_._1).map { case (id, w) => (id, w.toLong) }
      .toDF("doc_id", "w")
    val viaOp = Packing.packGreedy(docs, "doc_id", "w", 256L, bucketSize = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    val viaWindow = docs
      .withColumn("cum", sum(col("w")).over(w))
      .withColumn("bin",
        floor((col("cum") - col("w")).cast("decimal(25,0)") / 256).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("total_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaOp === viaWindow)
  }

  test("no single-partition window over the row data") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, 5L)).toDF("doc_id", "w")
    val plan = Packing.packGreedy(docs, "doc_id", "w", 64L, bucketSize = 10)
      .queryExecution.executedPlan.toString
    // exactly ONE single-partition exchange (the bucket-sum offsets table,
    // post-aggregation); the row-level cumsum window partitions by bucket
    assert("Exchange SinglePartition".r.findAllIn(plan).length === 1, plan)
    assert(plan.contains("partitionBy=[b#") || plan.contains("windowspecdefinition(b#"),
      plan)
  }

  test("epochSample: seeded permutation, exact prefix sums, budget cut") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, (i % 7) + 1L)).toDF("doc_id", "w")
    val out = Packing.epochSample(docs, "doc_id", "w", budget = 100L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // ranks are a permutation of 1..n
    assert(out.map(_._2).sorted.toSeq === (1L to 200L).toSeq)
    // cum at rank r equals the sum of weights of ranks 1..r (exact cumsum
    // across bucket boundaries)
    val byRank = out.sortBy(_._2)
    val weights = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var running = 0L
    byRank.foreach { case (id, _, cum, kept) =>
      running += weights(id)
      assert(cum === running, s"cum mismatch at doc $id")
      assert(kept === (cum <= 100L))
    }
    // kept rows are exactly the order prefix
    val keptRanks = out.filter(_._4).map(_._2)
    assert(keptRanks.sorted.toSeq === (1L to keptRanks.length).toSeq)
    // another seed is a different epoch order
    val other = Packing.epochSample(docs, "doc_id", "w", 100L, seed = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val same = out.count { case (id, rk, _, _) => other(id) == rk }
    assert(same < 50, s"epochs should differ, $same/200 ranks identical")
  }

  test("packingCurve: per-capacity bins, straddles, splits, tail waste from one layout") {
    import spark.implicits._
    // weights in id order: 3, 4, 2, 5 → cum 3, 7, 9, 14 (contiguous stream)
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 5L))
      .toDF("doc_id", "w")
    val out = Packing.packingCurve(docs, "doc_id", "w",
        capacities = Seq(4L, 8L), bucketSize = 2)
      .collect().map(r => r.getAs[Long]("capacity") -> r).toMap
    // cap 4: spans [0,3) [3,7) [7,9) [9,14) → startBin 0,0,1,2 /
    // endBin 0,1,2,3: docs 2,3,4 each cross one boundary
    assert(out(4L).getAs[Long]("n_bins") === 4L) // ceil(14/4)
    assert(out(4L).getAs[Long]("n_docs") === 4L)
    assert(out(4L).getAs[Long]("n_straddle") === 3L)
    assert(out(4L).getAs[Long]("n_splits") === 3L)
    assert(out(4L).getAs[Long]("total_tokens") === 14L)
    // a contiguous stream fills every interior bin: waste is the tail only
    assert(out(4L).getAs[Long]("wasted_tokens") === 4L * 4 - 14)
    assert(out(4L).getAs[Long]("fill_fp") === 14L * 1048576L / 16L)
    // cap 8: endBins 0,0,1,1 — only doc 3 [7,9) crosses the 8-boundary
    assert(out(8L).getAs[Long]("n_bins") === 2L)
    assert(out(8L).getAs[Long]("n_straddle") === 1L)
    assert(out(8L).getAs[Long]("n_splits") === 1L)
    assert(out(8L).getAs[Long]("wasted_tokens") === 2L * 8 - 14)
    assert(out(8L).getAs[Long]("total_tokens") === 14L)
  }

  test("packingCurve: a doc longer than the capacity is counted by coverage, not start bin") {
    import spark.implicits._
    val docs = Seq((1L, 10L)).toDF("doc_id", "w")
    val out = Packing.packingCurve(docs, "doc_id", "w",
        capacities = Seq(4L), bucketSize = 4)
      .collect().head
    // span [0,10) covers bins 0..2 — the per-start-bin formulation would
    // report 1 bin, 0 waste, and a 250% fill
    assert(out.getAs[Long]("n_bins") === 3L)
    assert(out.getAs[Long]("n_straddle") === 1L)
    assert(out.getAs[Long]("n_splits") === 2L)
    assert(out.getAs[Long]("wasted_tokens") === 2L)
    assert(out.getAs[Long]("fill_fp") === 10L * 1048576L / 12L)
    assert(out.getAs[Long]("fill_fp") <= 1048576L)
  }

  test("paddingEfficiency: power-of-two caps, exact waste, min bucket, w<=0 dropped") {
    import spark.implicits._
    // w=1..16 land in cap 16; 17 in 32; 100 in 128; 0 and -3 dropped
    val docs = Seq(1L, 15L, 16L, 17L, 100L, 0L, -3L).toDF("w")
    val out = Packing.paddingEfficiency(docs, "w")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(16L, 32L, 128L))
    assert(out(16L).getAs[Long]("n_seqs") === 3L)
    assert(out(16L).getAs[Long]("total_tokens") === 32L)
    assert(out(16L).getAs[Long]("padded_tokens") === 48L)
    assert(out(16L).getAs[Long]("pad_waste") === 16L)
    // eff = 32/48 = 2/3 → floor(2/3 · 2^20) = 699050
    assert(out(16L).getAs[Long]("eff_fp") === 699050L)
    assert(out(32L).getAs[Long]("pad_waste") === 15L)
    assert(out(128L).getAs[Long]("pad_waste") === 28L)
    // exact power-of-two boundary stays in its own bucket (16 → cap 16)
    assert(out(16L).getAs[Long]("bucket_cap") === 16L)
  }
}
