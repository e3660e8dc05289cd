package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `rightTs <= leftTs` on the same key. Spark has no built-in as-of
  * operator; the preference-order-(a) composition (brief: "compose existing
  * ops if semantics allow") is the union+window trick:
  *
  *   1. tag both inputs and union them (right side carries its payload
  *      columns, left side carries nulls there);
  *   2. ONE window partitioned by key, ordered by (ts, side) — right rows
  *      sort before left rows at equal timestamps, giving `<=` semantics;
  *   3. `last(payload, ignoreNulls)` over the unbounded-preceding frame
  *      fills each left row with the most recent right payload;
  *   4. keep only left rows.
  *
  * Scale: ONE shuffle on the key — no join, so no range-explosion (a naive
  * `l JOIN r ON key AND r.ts <= l.ts` materializes O(|matches|²) pairs
  * before aggregation) and no broadcast requirement. The classic
  * interval-state layout for backfills/feature lookups at 100 TB. Hot keys
  * concentrate in one partition (windows cannot skew-split); salt the key
  * upstream if a single key exceeds a partition.
  *
  * Ties INSIDE the right side (two right rows, same key, same ts) are
  * caller-resolved: pre-aggregate the right input to one row per (key, ts)
  * to keep results deterministic.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = payloadCols.foldLeft(
      left.withColumn("_ts", col(leftTsCol)).withColumn("_side", lit(1))) {
      (df, c) =>
        df.withColumn(prefix + c, lit(null).cast(right.schema(c).dataType))
    }
    val r0 = right.select(
      (col(keyCol) +: col(rightTsCol).as("_ts") +:
        payloadCols.map(c => col(c).as(prefix + c))): _*)
      .withColumn("_side", lit(0))
    val r = leftCols.filterNot(_ == keyCol).foldLeft(r0) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols =
      leftCols.map(col) ++ Seq(col("_ts"), col("_side")) ++
        payloadCols.map(c => col(prefix + c))
    val u = l.select(cols: _*).unionByName(r.select(cols: _*))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(u) { (df, c) =>
      df.withColumn(prefix + c, last(col(prefix + c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1).drop("_side", "_ts")
  }
}
