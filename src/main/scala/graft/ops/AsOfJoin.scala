package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for each left row, the latest right row with
  * `rightTs <= leftTs` on the same key. Spark has no built-in as-of
  * operator; the preference-order-(a) composition (brief: "compose existing
  * ops if semantics allow") is the union+window trick:
  *
  *   1. tag both inputs and union them (right side carries ONE struct of all
  *      its payload columns, left side carries a null struct);
  *   2. ONE window partitioned by key, ordered by (ts, side) — right rows
  *      sort before left rows at equal timestamps, giving `<=` semantics;
  *   3. `last(payload_struct, ignoreNulls)` over the unbounded-preceding
  *      frame fills each left row with the most recent right row's WHOLE
  *      payload — a single struct, so a NULL field in the latest right row
  *      stays NULL (per-column fills would leak older non-null values and
  *      could mix columns from different right rows — DuckDB ASOF JOIN
  *      semantics are per-row, not per-column);
  *   4. unpack the struct, keep only left rows.
  *
  * Scale: ONE shuffle on the key — no join, so no range-explosion (a naive
  * `l JOIN r ON key AND r.ts <= l.ts` materializes O(|matches|²) pairs
  * before aggregation) and no broadcast requirement. The classic
  * interval-state layout for backfills/feature lookups at 100 TB. Hot keys
  * concentrate in one partition (windows cannot skew-split); use
  * [[asOfBucketed]] when a single key exceeds a partition.
  *
  * Ties INSIDE the right side (two right rows, same key, same ts) are
  * caller-resolved: pre-aggregate the right input to one row per (key, ts)
  * to keep results deterministic.
  */
object AsOfJoin {

  private def payloadType(right: DataFrame, payloadCols: Seq[String]): StructType =
    StructType(payloadCols.map(c => right.schema(c)))

  /** Pad `df` with left-side columns (as typed nulls) that it lacks. */
  private def padLeftCols(df: DataFrame, left: DataFrame, keyCol: String): DataFrame =
    left.columns.toSeq.filterNot(_ == keyCol).foldLeft(df) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

  private def unpack(
      filled: DataFrame, payloadCols: Seq[String], prefix: String): DataFrame = {
    val unpacked = payloadCols.foldLeft(filled) { (df, c) =>
      df.withColumn(prefix + c, col("_p").getField(c))
    }
    unpacked.filter(col("_side") === 1).drop("_side", "_ts", "_p", "_bucket")
  }

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val l = left
      .withColumn("_ts", col(leftTsCol)).withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(payloadType(right, payloadCols)))
    val r = padLeftCols(
      right.select(
        col(keyCol), col(rightTsCol).as("_ts"),
        struct(payloadCols.map(col): _*).as("_p"))
        .withColumn("_side", lit(0)),
      left, keyCol)
    val cols = left.columns.toSeq.map(col) ++ Seq(col("_ts"), col("_side"), col("_p"))
    val u = l.select(cols: _*).unionByName(r.select(cols: _*))
      .withColumn("_bucket", lit(0L))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unpack(u.withColumn("_p", last(col("_p"), ignoreNulls = true).over(w)),
      payloadCols, prefix)
  }

  /** Hot-key-safe as-of join: identical semantics to [[asOf]], but the
    * window partitions on (key, time bucket) so a key owning half the data
    * splits across `ts / bucketWidth` partitions instead of one.
    *
    * Cross-bucket state is restored by a carry-in pre-pass: the last right
    * payload per (key, bucket) is aggregated (map-side combinable), a
    * prefix window over the tiny per-bucket frame computes each bucket's
    * latest EARLIER-bucket payload, and that carry enters the bucket as a
    * synthetic right row at the bucket boundary (side −1, sorting before
    * everything in the bucket). Three shuffles total — (key,bucket) twice
    * and key over the per-bucket aggregate (rows ≈ keys × buckets, data-size
    * independent) — in exchange for windows that never exceed one bucket of
    * one key.
    */
  def asOfBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      bucketWidth: Long,
      prefix: String = "asof_"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // integral `div`, not double division: epoch-ns timestamps exceed 2^53
    // and would lose precision in a double quotient (ts assumed ≥ 0)
    val bucketExpr = expr(s"_ts div ${bucketWidth}L")
    val pType = payloadType(right, payloadCols)

    val l = left
      .withColumn("_ts", col(leftTsCol)).withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(pType))
      .withColumn("_bucket", bucketExpr)
    val r = padLeftCols(
      right.select(
        col(keyCol), col(rightTsCol).as("_ts"),
        struct(payloadCols.map(col): _*).as("_p"))
        .withColumn("_side", lit(0))
        .withColumn("_bucket", bucketExpr),
      left, keyCol)

    // last right payload per (key, bucket): one aggregate, map-side combined
    val rPerBucket = r.groupBy(col(keyCol), col("_bucket"))
      .agg(max_by(col("_p"), col("_ts")).as("_bp"))
    // every (key, bucket) either side touches
    val buckets = l.select(col(keyCol), col("_bucket"))
      .unionByName(r.select(col(keyCol), col("_bucket"))).distinct()
      .join(rPerBucket, Seq(keyCol, "_bucket"), "left")
    // carry-in = latest earlier-bucket payload; frame excludes the bucket
    // itself. The windowed frame has keys × buckets rows — tiny — so the
    // per-key window here is skew-immune.
    val wCarry = Window.partitionBy(keyCol).orderBy(col("_bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = buckets
      .withColumn("_p", last(col("_bp"), ignoreNulls = true).over(wCarry))
      .filter(col("_p").isNotNull)
      .withColumn("_ts", (col("_bucket") * bucketWidth).cast(right.schema(rightTsCol).dataType))
      .withColumn("_side", lit(-1))
      .drop("_bp")
    val carriesPadded = padLeftCols(carries, left, keyCol)

    val cols = left.columns.toSeq.map(col) ++
      Seq(col("_ts"), col("_side"), col("_p"), col("_bucket"))
    val u = l.select(cols: _*)
      .unionByName(r.select(cols: _*))
      .unionByName(carriesPadded.select(cols: _*))
    val w = Window.partitionBy(col(keyCol), col("_bucket"))
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unpack(u.withColumn("_p", last(col("_p"), ignoreNulls = true).over(w)),
      payloadCols, prefix)
  }
}
