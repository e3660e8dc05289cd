package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy auditing for datasets about people: k-anonymity over a set of
  * quasi-identifier columns. A released dataset is k-anonymous when every
  * quasi-identifier combination is shared by ≥ k rows; combinations below k
  * single out individuals and must be suppressed or generalized before
  * release.
  *
  * Scale: one hash aggregation keyed on the quasi-identifier tuple — the
  * shuffle carries (tuple, partial count), map-side combined, so cost is
  * O(distinct combinations), not O(rows). The suppression filter is then a
  * broadcast-or-shuffle semi-join of the data against the below-k tuples
  * (small by definition when the data is nearly anonymous).
  */
object Privacy {

  /** Per-combination audit: quasi-identifier values, group size, and
    * whether the group meets the k threshold.
    */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("anonymous", col("group_size") >= k)
  }

  /** Rows whose quasi-identifier combination fails k — the suppression set
    * (left-semi join against the failing tuples).
    */
  def suppressionSet(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    val failing = kAnonymityAudit(df, quasiIds, k)
      .filter(!col("anonymous")).select(quasiIds.map(col): _*)
    df.join(failing, quasiIds, "left_semi")
  }
}
