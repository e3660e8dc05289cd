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

  /** Incremental SCD2 maintenance: merge a batch of new observations into
    * an existing [[fromChangeLog]] output WITHOUT rebuilding unaffected
    * keys. Keys absent from `updates` pass through untouched (no shuffle
    * beyond the semi/anti probe); touched keys are re-derived from their
    * version rows + the new observations, so late (out-of-order) arrivals
    * split historical windows and no-op re-statements do not open
    * versions. When the same (key, ts) appears in both sides the UPDATE
    * wins (correction semantics).
    *
    * Semantics are defined AGAINST THE STORED VERSIONS: the SCD2 table is
    * the system of record, so a no-op observation collapsed by an earlier
    * build is gone — a later mid-history insert between it and its keeper
    * re-derives from the keeper only. Consequently the result is
    * bit-identical to rebuilding from the full concatenated change log
    * (what q145's oracle checks) whenever each key's updates land at or
    * after its last stored observation — the daily-merge case — or the
    * prior build collapsed nothing; Scd2Spec pins both this equality and
    * the mid-history window split. Work is proportional to the touched
    * keys, which is what a dimension merge needs at warehouse scale.
    */
  def applyChanges(
      current: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val touched = updates.select(keys: _*).distinct()
    val untouched = current.join(touched, keyCols, "left_anti")
    val obsCols = keys ++ (col(tsCol) +: attrCols.map(col))
    val replayed = current.join(touched, keyCols, "left_semi")
      .select(keys ++ (col("effective_from").as(tsCol) +: attrCols.map(col)): _*)
    val log = replayed.withColumn("__src", lit(0))
      .unionByName(updates.select(obsCols: _*).withColumn("__src", lit(1)))
    // correction precedence: on a (key, ts) collision the update's row wins
    val wTs = Window
      .partitionBy((keys :+ col(tsCol)): _*)
      .orderBy(col("__src").desc)
    val deduped = log
      .withColumn("__pick", row_number().over(wTs))
      .filter(col("__pick") === 1)
      .drop("__src", "__pick")
    untouched.unionByName(fromChangeLog(deduped, keyCols, tsCol, attrCols))
  }
}
