package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benford first-digit audit: compares the observed leading-digit
  * distribution of a positive numeric column against Benford's law —
  * the standard screen for fabricated or mechanically-generated amounts
  * in financial and telemetry feeds.
  */
object Benford {

  /** Expected Benford proportion per leading digit d, as a
    * floor(log10(1 + 1/d)·10⁹) fixed-point constant. Computed once here
    * and embedded as a literal on BOTH engine sides of the oracle, so no
    * cross-engine float log is ever evaluated.
    */
  val expectedFp: Seq[Long] =
    (1 to 9).map(d => math.floor(math.log10(1.0 + 1.0 / d) * 1e9).toLong)

  /** CASE chain mapping a digit column to its expected fixed-point mass. */
  private def expectedExpr(digit: Column): Column =
    expectedFp.zipWithIndex.foldLeft(lit(0L)) { case (acc, (e, i)) =>
      when(digit === (i + 1), lit(e)).otherwise(acc)
    }

  /** Per (group, leading digit): observed count, group total, expected
    * fixed-point mass, and the integer deviation
    * |n·10⁹ − n_group·expected_fp| — exact, so two engines agree bit-for-
    * bit and a "suspicious group" threshold is reproducible.
    *
    * `value` must be an integral column (floor any double BEFORE casting —
    * Spark truncates double→long where other engines round); rows < 1 are
    * out of Benford's domain and dropped. The leading digit comes from the
    * decimal string form of the integer, which is engine-independent.
    *
    * Scale: one hash aggregation to ≤ 9 rows per group, then a window
    * over those tiny per-group rows. The corpus is scanned once.
    */
  def audit(df: DataFrame, value: Column, groupCol: String): DataFrame = {
    val g = col(groupCol)
    val counts = df
      .select(g, value.cast("long").as("__x"))
      .filter(col("__x") >= 1L)
      .select(g, substring(col("__x").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(g, col("digit"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("n_grp", sum(col("n")).over(Window.partitionBy(g)).cast("long"))
      .select(g, col("digit"), col("n").cast("long").as("n"), col("n_grp"),
        expectedExpr(col("digit")).as("exp_fp"))
      .withColumn("dev_fp",
        abs(col("n") * lit(1000000000L) - col("n_grp") * col("exp_fp")).cast("long"))
  }
}
