package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension build from a change log.
  *
  * Input: one row per observed state — (key columns, event-time column,
  * attribute columns). Output: one row per VERSION — consecutive
  * observations with identical attribute values collapse into the earliest
  * one (a no-op change must not open a new version), and each version
  * carries its half-open validity window:
  *
  *   key…, attrs…, effective_from, effective_to (null = open-ended),
  *   version (1-based per key), is_current.
  *
  * This is the warehouse-side dual of the reference's snapshot/time-travel
  * restore (bigquery-restore/restore_dataset.sh:174-186 reconstructs state
  * AS OF a timestamp; an SCD2 table answers the same question with a range
  * predicate instead of a restore job).
  *
  * Scale: ONE hash shuffle on the key columns. Both windows (change
  * detection, then version numbering over the survivors) and the final
  * projection share the same partitioning and sort order, so Catalyst plans
  * a single Exchange + sort and runs the second Window without re-shuffling.
  * No joins, no driver-side state; skewed keys are bounded by the per-key
  * version count, not the corpus size.
  */
object Scd2 {

  /** `changes` must be unique on (keyCols, tsCol) — pre-aggregate first
    * (e.g. `max_by` per key+ts) so version order is total and the output
    * deterministic. `tsCol` is any orderable type (epoch ns, timestamp).
    */
  def fromChangeLog(
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs required")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    // Null-safe attr comparison (<=>): a null attribute equal to the
    // previous null is still "no change". The row_number()==1 guard keeps
    // a first row whose attrs are all null (lag null <=> null would read
    // as "same" and wrongly drop the opening version).
    val sameAsPrev = attrCols
      .map(a => lag(col(a), 1).over(w) <=> col(a))
      .reduce(_ && _)
    val versions = changes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__same", sameAsPrev)
      .filter(col("__rn") === 1 || !col("__same"))
    val validTo = lead(col(tsCol), 1).over(w)
    versions.select(
      keyCols.map(col) ++ attrCols.map(col) ++ Seq(
        col(tsCol).as("effective_from"),
        validTo.as("effective_to"),
        row_number().over(w).cast("long").as("version"),
        validTo.isNull.as("is_current")): _*)
  }
}
