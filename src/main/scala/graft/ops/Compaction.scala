package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file / small-partition compaction planning — the lake-maintenance
  * step that decides which physical units (part-files of a table, hive
  * partitions of a dataset) to rewrite together so outputs land near a
  * target size.
  *
  * The assignment is offset binning over an exclusive prefix sum in a
  * deterministic unit order: `group_id = (rows before me) div target`.
  * That is the distributed form of next-fit packing (a unit may straddle a
  * boundary; it stays with its offset's group), identical to
  * [[Packing.packGreedy]]'s bin math — same semantics both engines, no
  * floats anywhere.
  *
  * Scale: the input here is unit METADATA (one row per file/partition from
  * footer-only catalog scans), i.e. catalog-scale, so one global window
  * over it is the honest plan. If a table ever holds data-scale unit
  * counts (100M+ files), switch the prefix sum to packGreedy's bucketed
  * layout — the bin math is unchanged.
  */
object Compaction {

  /** Per-unit plan: (unit, n_rows, start_row, group_id), ordered by
    * `unitCol` — group_id is the output shard this unit is rewritten into.
    */
  def plan(units: DataFrame, unitCol: String, rowsCol: String, targetRows: Long): DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    val w = Window.orderBy("unit").rowsBetween(Window.unboundedPreceding, -1)
    units
      .select(col(unitCol).as("unit"), col(rowsCol).cast("long").as("n_rows"))
      .withColumn("start_row", coalesce(sum(col("n_rows")).over(w), lit(0L)))
      .withColumn("group_id", expr(s"start_row div $targetRows"))
  }

  /** Group-level summary of [[plan]]: how many units merge into each
    * output shard and how full it lands vs the target.
    */
  def planSummary(
      units: DataFrame, unitCol: String, rowsCol: String, targetRows: Long): DataFrame =
    plan(units, unitCol, rowsCol, targetRows)
      .groupBy("group_id")
      .agg(
        count(lit(1)).as("n_units"),
        sum(col("n_rows")).as("total_rows"),
        (sum(col("n_rows")).cast("double") / targetRows.toDouble).as("fill_ratio"))
}
