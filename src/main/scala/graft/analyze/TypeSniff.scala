package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Logical-type inference over string columns — the "schema sniffing" pass
  * a lakehouse catalog runs over CSV/JSON-ingested string tables before
  * proposing typed schemas (the reference's schema analyzer infers key
  * roles from names; this infers TYPES from values, the other half of
  * onboarding an untyped feed).
  *
  * Every candidate type is an anchored regex in the Java∩RE2 subset so the
  * verdict is engine-portable. A column gets a typed verdict only when
  * EVERY non-null value matches (ingestion must never lose a value);
  * precedence bigint → double → boolean → date → timestamp → json →
  * string, so the narrowest lossless type wins.
  *
  * Scale: one scan; the wide table is exploded to (col_name, value) pairs
  * via a single generated-array projection (one Expand, like the
  * composite-key probe), and the per-column counters are map-side-combined
  * sums — the shuffle carries |columns| rows of counters, never data.
  */
object TypeSniff {

  val intPattern = "^[+-]?[0-9]+$"
  val numPattern = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
  val boolPattern = "(?i)^(true|false)$"
  val datePattern = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
  val tsPattern =
    "^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?$"
  val jsonPattern = "^\\{.*\\}$"

  /** Sniff a long-format (col_name, value) pair table — the shape produced
    * by [[inferTypes]] or by unioning projections of several tables.
    */
  def inferTypesLong(
      pairs: DataFrame,
      nameCol: String = "col_name",
      valueCol: String = "v"): DataFrame = {
    val v = col(valueCol)
    def matches(p: String, as: String): Column =
      sum(when(v.isNotNull && v.rlike(p), 1L).otherwise(0L)).as(as)
    val counted = pairs
      .groupBy(col(nameCol))
      .agg(
        count(v).as("n_values"),
        sum(when(v.isNull, 1L).otherwise(0L)).as("n_null"),
        matches(intPattern, "n_int"),
        matches(numPattern, "n_num"),
        matches(boolPattern, "n_bool"),
        matches(datePattern, "n_date"),
        matches(tsPattern, "n_ts"),
        matches(jsonPattern, "n_json"))
    counted.withColumn("verdict",
      when(col("n_values") === 0L, "unknown")
        .when(col("n_int") === col("n_values"), "bigint")
        .when(col("n_num") === col("n_values"), "double")
        .when(col("n_bool") === col("n_values"), "boolean")
        .when(col("n_date") === col("n_values"), "date")
        .when(col("n_ts") === col("n_values"), "timestamp")
        .when(col("n_json") === col("n_values"), "json")
        .otherwise("string"))
  }

  /** Sniff named columns of one table: stringify each, explode to the long
    * format in ONE projection (single scan), and count per column.
    */
  def inferTypes(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to sniff")
    val pairs = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
    inferTypesLong(pairs)
  }
}
