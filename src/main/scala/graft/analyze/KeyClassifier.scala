package graft.analyze

import graft.core.DetectionConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level key classification (SURVEY §2.2 P1-P7).
  *
  * Re-expresses the reference's schema analysis
  * (schema_analyzer.py:42-218: PK/FK candidate predicates, regex pattern
  * sets; pattern_config.py:187-239: configured indicators) as pure Catalyst
  * `Column` expressions over the exploded column catalog — the whole rule set
  * compiles into boolean expressions, UDF-free, so Catalyst can fold, prune
  * and pipeline it (and it runs identically on a 10-table catalog or a
  * 10,000-table lake).
  *
  * Naming model:
  *   - `base_name`   — column name with an optional 1-2 letter table prefix
  *     stripped (TPC-H style `o_custkey` → `custkey`; warehouse-style names
  *     pass through).
  *   - `key_stem`    — base name with a key suffix (`id|key|fk|pk|hk|sk|
  *     hash_key`) stripped: `custkey` → `cust`, `user_id` → `user`.
  *   - PK candidate  — non-array, key-typed, and its stem names its own
  *     table (`order`⊑`orders`, `cust`⊑`customer`) or the name is exactly
  *     `id`/`key` (schema_analyzer.py:163-189 semantics).
  *   - FK candidate  — non-array, key-typed, key-suffixed, and NOT the
  *     table's own PK (schema_analyzer.py:191-218).
  */
object KeyClassifier {

  /** Type-compatibility groups (relationship_detector.py:929-935 /
    * data_relationship_tester.py:217-234), keyed by Spark typeName.
    */
  val typeGroup: Column => Column = dt =>
    when(dt.isin("integer", "bigint", "smallint", "tinyint"), "int")
      .when(dt.isin("string", "varchar", "char"), "string")
      .when(dt.isin("double", "float", "decimal"), "float")
      .when(dt.isin("boolean"), "bool")
      .otherwise(dt)

  /** Annotate a column catalog (ColumnRef-shaped DataFrame) with base_name,
    * key_stem, type_group, is_pk_candidate, is_fk_candidate.
    */
  def classify(cols: DataFrame, cfg: DetectionConfig = DetectionConfig()): DataFrame = {
    val base = regexp_replace(lower(col("columnName")), cfg.prefixStripRegex, "")
    val stem = regexp_replace(base, cfg.keySuffixRegex, "")
    val keyTyped = col("dataType").isin(cfg.keyDataTypes.toSeq: _*)
    val hasKeySuffix = base.rlike(cfg.keySuffixRegex)

    // Warehouse/data-vault table prefixes (h_/dim_/l_/ref_/fact_/bridge_,
    // schema_analyzer.py:328-447) strip off for name comparisons.
    val tableBase =
      regexp_replace(lower(col("tableName")), "^(h_|dim_|l_|ref_|fact_|bridge_|tbl_|table_)", "")

    val withNames = cols
      .withColumn("base_name", base)
      .withColumn("key_stem", stem)
      .withColumn("table_base", tableBase)
      .withColumn("type_group", typeGroup(col("dataType")))

    // PK: stem names its own table (order⊑orders, customer⊑dim_customer)
    // or bare id/key.
    val stemNamesTable =
      (length(col("key_stem")) >= 3 && col("table_base").startsWith(col("key_stem"))) ||
        col("key_stem") === col("table_base") ||
        col("key_stem") === regexp_replace(col("table_base"), "s$", "")
    // Configured indicators (P6/P7): wildcard-derived anchored regexes from
    // ConfigLoader extend the built-in heuristics; empty lists fold to false
    // and leave behavior untouched. Matched against the LOWERCASED name —
    // the reference lowercases before matching (pattern_config.py:193,229),
    // so non-wildcard entries are exact equality on the lowered name.
    def indicatorHit(regexes: Seq[String]): Column =
      regexes.foldLeft(lit(false))((acc, p) => acc || lower(col("columnName")).rlike(p))

    // Per-table-class patterns (pattern_config.py:187-239): a column counts
    // as PK/FK when its table name starts with the class prefix AND the
    // (lowercased) column name matches one of the class's patterns. The
    // whole config compiles to one literal boolean CASE chain per flag.
    def tablePatternHit(sel: graft.core.TablePattern => Seq[String]): Column =
      cfg.tablePatterns.foldLeft(lit(false)) { (acc, tp) =>
        val colHit = sel(tp).foldLeft(lit(false))((a, p) =>
          a || lower(col("columnName")).rlike(graft.core.ConfigLoader.wildcardToRegex(p)))
        acc || (lower(col("tableName")).startsWith(tp.prefix.toLowerCase) && colHit)
      }

    val isPk = !col("isArray") && ((keyTyped && hasKeySuffix &&
      (col("base_name").isin("id", "key") || stemNamesTable)) ||
      indicatorHit(cfg.pkIndicatorRegexes) ||
      tablePatternHit(_.pkPatterns))

    val flagged = withNames.withColumn("is_pk_candidate", isPk)
    // FK: key-suffixed, key-typed, not its own table's PK.
    flagged.withColumn(
      "is_fk_candidate",
      !col("isArray") && !col("is_pk_candidate") &&
        ((keyTyped && hasKeySuffix) || indicatorHit(cfg.fkIndicatorRegexes) ||
          tablePatternHit(_.fkPatterns)))
  }
}
