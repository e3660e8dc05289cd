package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: documents are laid out in
  * a fixed global order (by id) and cut into contiguous `capacity`-token
  * bins — each document's bin is the bin its START offset falls in (the
  * greedy contiguous-fill approximation; a straddling document stays with
  * its start bin, matching how packed-sequence writers emit).
  *
  * The global running offset is a DISTRIBUTED prefix sum, not a
  * single-partition window: ids are statically bucketed (`id div
  * bucketSize` — deterministic, no range-sampling), each bucket's token sum
  * aggregates map-side, the tiny bucket-sum table turns into per-bucket
  * starting offsets with one small window, and offsets broadcast-join back
  * onto the rows, where a per-bucket window finishes the cumsum. No stage
  * ever moves more than one bucket through one task, so the layout scales
  * to any corpus; only the bucket-sum table (|ids| / bucketSize rows) is
  * windowed globally — pick bucketSize so that table stays millions, and
  * recurse the same trick if it ever doesn't.
  *
  * Offsets go through decimal, not double, division (exact past 2⁵³ — a
  * 100 TB corpus is ~2⁴⁵ tokens, but the discipline is free).
  */
object Packing {

  /** One row per bin: bin, n_docs, total_tokens, fill_ratio. `weightCol`
    * must be a non-negative integral token count; `idCol` an integral id
    * defining the pack order.
    */
  /** The distributed global prefix sum every packing surface shares:
    * (id, w, cum) with `cum` the inclusive running token total in id
    * order, built bucket-wise as described above.
    */
  private[ops] def withGlobalCum(
      docs: DataFrame, idCol: String, weightCol: String,
      bucketSize: Int): DataFrame = {
    val bucket = floor(col(idCol).cast("decimal(25,0)") / bucketSize).cast("long")
    val rows = docs.select(
      col(idCol).as("id"), col(weightCol).cast("long").as("w"), bucket.as("b"))
    val offsets = rows
      .groupBy("b")
      .agg(sum(col("w")).as("bsum"))
      .withColumn("offset",
        coalesce(
          sum(col("bsum")).over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("bsum")
    val local = Window.partitionBy("b").orderBy("id")
    rows
      .join(broadcast(offsets), "b")
      .withColumn("cum", col("offset") + sum(col("w")).over(local))
      .select(col("id"), col("w"), col("cum"))
  }

  def packGreedy(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      capacity: Long,
      bucketSize: Int = 1024): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    withGlobalCum(docs, idCol, weightCol, bucketSize)
      .withColumn("bin",
        floor((col("cum") - col("w")).cast("decimal(25,0)") / capacity).cast("long"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("w")).as("total_tokens"),
        (sum(col("w")).cast("double") / lit(capacity.toDouble)).as("fill_ratio"))
  }

  /** Packing-capacity operating curve (E206): [[packGreedy]]'s layout
    * cost at SEVERAL context-window capacities from ONE shared global
    * prefix sum — the report that picks the training sequence length
    * before a run commits to it. Per capacity: bin count, straddle count
    * (documents whose tokens cross a bin boundary — the rows a
    * no-cross-attention packer must mask or split), exact wasted tokens
    * Σ max(0, capacity − bin fill), and the 2²⁰ fixed-point fill factor.
    *
    * Scale: the prefix sum runs once (bucketed, map-side, broadcast
    * offsets); capacities fan out as a ≤|capacities| explode and
    * everything after is two hash aggregations. Bin division uses exact
    * integer floorDiv, never decimal-rounded division.
    */
  def packingCurve(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      capacities: Seq[Long] = Seq(512L, 1024L, 2048L, 4096L, 8192L),
      bucketSize: Int = 1024): DataFrame = {
    require(capacities.nonEmpty && capacities.forall(_ > 0),
      "capacities must be positive")
    import graft.ext.ExactMath.floorDiv
    val perBin = withGlobalCum(docs, idCol, weightCol, bucketSize)
      .withColumn("capacity", explode(typedlit(capacities)))
      .withColumn("start", col("cum") - col("w"))
      .withColumn("bin", floorDiv(col("start"), col("capacity")))
      .withColumn("straddle",
        when(col("w") > 0L &&
          floorDiv(col("cum") - 1L, col("capacity")) > col("bin"), 1L)
          .otherwise(0L))
      .groupBy("capacity", "bin")
      .agg(count(lit(1)).as("nd"), sum(col("w")).as("tok"),
        sum(col("straddle")).as("sd"))
    perBin
      .groupBy("capacity")
      .agg(
        count(lit(1)).as("n_bins"),
        sum(col("nd")).cast("long").as("n_docs"),
        sum(col("sd")).cast("long").as("n_straddle"),
        sum(col("tok")).cast("long").as("total_tokens"),
        sum(greatest(col("capacity") - col("tok"), lit(0L))).cast("long")
          .as("wasted_tokens"))
      .select(col("capacity"), col("n_bins"), col("n_docs"), col("n_straddle"),
        col("total_tokens"), col("wasted_tokens"),
        floorDiv(col("total_tokens") * lit(1048576L),
          col("n_bins") * col("capacity")).cast("long").as("fill_fp"))
  }

  /** Padding-efficiency report (E144): bucket sequences by
    * power-of-two length (the standard length-bucketed batching layout) and
    * report, per bucket, how many pad tokens that bucket costs when every
    * sequence is padded to the bucket cap — the report that decides bucket
    * granularity before a training run burns compute on padding.
    *
    * Bucket cap = max(minBucket, 2^⌈log₂ w⌉), computed with integer bit
    * arithmetic (`length(bin(w−1))`), never float log — exact in both
    * engines at any magnitude. Rows with w ≤ 0 are dropped.
    *
    * Scale: map-only projection + one hash aggregation to ≤ log₂(maxLen)
    * rows.
    */
  def paddingEfficiency(
      docs: DataFrame,
      weightCol: String,
      minBucket: Long = 16L): DataFrame = {
    require(minBucket >= 2 && (minBucket & (minBucket - 1)) == 0,
      "minBucket must be a power of two >= 2")
    val w = col(weightCol).cast("long")
    docs.filter(w > 0)
      .select(w.as("w"))
      // shiftleft's column-arg form only exists in SQL; the bit-length trick
      // (length(bin(w−1))) is exact where float log2 is not
      .withColumn("bucket_cap",
        greatest(lit(minBucket), expr("shiftleft(CAST(1 AS BIGINT), length(bin(w - 1)))")))
      .select(col("bucket_cap"), col("w"))
      .groupBy("bucket_cap")
      .agg(
        count(lit(1)).as("n_seqs"),
        sum(col("w")).cast("long").as("total_tokens"))
      .select(
        col("bucket_cap").cast("long").as("bucket_cap"),
        col("n_seqs"), col("total_tokens"),
        (col("n_seqs") * col("bucket_cap")).cast("long").as("padded_tokens"),
        (col("n_seqs") * col("bucket_cap") - col("total_tokens")).cast("long")
          .as("pad_waste"),
        graft.ext.ExactMath.floorDiv(
          col("total_tokens") * lit(1048576L),
          col("n_seqs") * col("bucket_cap")).as("eff_fp"))
  }

  /** Deterministic epoch shuffle + token-budget cut: documents take a
    * pseudo-random but fully reproducible order (md5-hash of the id,
    * seeded — a different seed is a different epoch), and the epoch keeps
    * the prefix of that order whose cumulative token count fits `budget`.
    * Both the global rank and the running token total come from the same
    * distributed prefix-sum layout as [[packGreedy]], with the hash value
    * itself as the static bucket key (uniform by construction — no
    * range sampling, no skew): per-bucket sums aggregate map-side, the
    * small bucket table is windowed once, offsets broadcast back.
    *
    * Output: (id, epoch_rank, cum_tokens, kept) — the epoch manifest a
    * trainer materializes or streams from.
    */
  def epochSample(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      seed: Int = 0): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    // 60-bit hash → 2¹⁶ static buckets of width 2⁴⁴
    val h = graft.ext.Dedup.stableHash(col(idCol).cast("string"), seed)
    val rows = docs.select(
      col(idCol).as("id"), col(weightCol).cast("long").as("w"), h.as("h"),
      graft.ext.ExactMath.floorDiv(h, lit(1L << 44)).as("b"))
    val offsets = rows
      .groupBy("b")
      .agg(sum(col("w")).as("bsum"), count(lit(1)).as("bcnt"))
      .withColumn("woff",
        coalesce(
          sum(col("bsum")).over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("roff",
        coalesce(
          sum(col("bcnt")).over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("bsum", "bcnt")
    val local = Window.partitionBy("b").orderBy(col("h"), col("id"))
    rows
      .join(broadcast(offsets), "b")
      .withColumn("cum_tokens", col("woff") + sum(col("w")).over(local))
      .withColumn("epoch_rank", col("roff") + row_number().over(local))
      .withColumn("kept", col("cum_tokens") <= budget)
      .select(col("id").as(idCol), col("epoch_rank").cast("long").as("epoch_rank"),
        col("cum_tokens"), col("kept"))
  }
}
