package graft.datatest

import graft.catalog.ParquetCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the constraint-suite
  * pattern (assert-on-data, not assert-on-code) extending DataTester's
  * relationship tests to single-table invariants: declare the rules, get a
  * per-rule violation report in ONE pass.
  *
  * Scale: every row-level rule compiles to one aggregate over the same
  * scan (map-side combined — adding a rule adds a column, not a pass);
  * `Unique` adds the one distinct aggregate Spark plans via Expand. The
  * single result row unpivots driver-side into the report. At 100 TB the
  * whole suite costs one table scan.
  */
object Expectations {

  sealed trait Rule {
    def name: String
    def column: String
  }
  /** Column must never be null. */
  final case class NotNull(column: String) extends Rule { val name = "not_null" }
  /** Non-null values must be distinct. */
  final case class Unique(column: String) extends Rule { val name = "unique" }
  /** Non-null values must fall in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = "in_range"
  }
  /** Non-null values must fully match `pattern` (Java∩RE2 regex subset —
    * the oracle-portable discipline).
    */
  final case class Matches(column: String, pattern: String) extends Rule {
    val name = "matches"
  }
  /** Table must have at least `n` rows. */
  final case class MinRows(n: Long) extends Rule {
    val name = "min_rows"; val column = "*"
  }

  /** Evaluate `rules`; one output row per rule:
    * (rule, column, violations, passed).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "check needs at least one rule")
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      r match {
        case NotNull(c) => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"v$i"))
        case Unique(c) => Seq(
          (count(col(c)) - countDistinct(col(c))).as(s"v$i"))
        case InRange(c, lo, hi) => Seq(
          sum(when(col(c).isNotNull &&
            (col(c).cast("double") < lo || col(c).cast("double") > hi), 1L)
            .otherwise(0L)).as(s"v$i"))
        case Matches(c, p) => Seq(
          sum(when(col(c).isNotNull && !col(c).rlike("^(?:" + p + ")$"), 1L)
            .otherwise(0L)).as(s"v$i"))
        case MinRows(n) => Seq(
          greatest(lit(0L), lit(n) - count(lit(1))).as(s"v$i"))
      }
    }
    val wide = ParquetCatalog.localized(df.agg(aggs.head, aggs.tail: _*))
    rules.zipWithIndex.map { case (r, i) =>
      wide.select(
        lit(r.name).as("rule"),
        lit(r.column).as("column"),
        col(s"v$i").cast("long").as("violations"),
        (col(s"v$i") === 0L).as("passed"))
    }.reduce(_ unionByName _)
  }
}
