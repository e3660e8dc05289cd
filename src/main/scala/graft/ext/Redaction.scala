package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: a configurable ordered list of
  * (name, regex, replacement) rules applied left-to-right with per-rule
  * match counts.
  *
  * Scale notes: pure per-row `regexp_replace` / `regexp_extract_all`
  * expressions — whole-stage codegen, no shuffle, no UDF. At 100 TB this is
  * a map-only pass that pipelines with the scan; the rule list is a
  * plan-time constant so every executor compiles the same automaton once.
  *
  * Patterns stay inside the regex subset with identical semantics in Java
  * (Spark) and RE2 (DuckDB oracle): character classes, bounded repetition,
  * alternation — no backreferences, no lookaround.
  */
object Redaction {

  /** One redaction rule; `mask` is a literal replacement token. */
  final case class Rule(name: String, pattern: String, mask: String)

  /** Default rule set for common PII shapes. Order matters: emails are
    * masked before bare digit runs so the digits inside an address do not
    * get double-masked.
    */
  val defaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,6}", "<EMAIL>"),
    Rule("phone", "[0-9]{2,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}", "<PHONE>"),
    Rule("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    Rule("number", "[0-9]+", "<NUM>"))

  /** Count of non-overlapping matches of `pattern` in `c`. */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Apply `rules` in order to `textCol`; emits `redacted` plus one
    * `n_<rule>` count column per rule (counted against the text as it looked
    * when that rule ran, i.e. after all earlier rules).
    */
  def redact(df: DataFrame, textCol: String,
             rules: Seq[Rule] = defaultRules): DataFrame = {
    val start = df.withColumn("redacted", col(textCol))
    rules.foldLeft(start) { (acc, r) =>
      acc
        .withColumn(s"n_${r.name}", matchCount(col("redacted"), r.pattern))
        .withColumn("redacted",
          regexp_replace(col("redacted"), r.pattern, r.mask))
    }
  }

  /** Corpus-level PII audit: one row per rule with the number of documents
    * it fired on and the total hit count — the release-gate report run
    * before a corpus freeze ships ("how much PII did we even find, and
    * where is it concentrated"). Counts come from the same ordered
    * [[redact]] pass, so they reflect rule precedence (digits inside an
    * already-masked email are not re-counted by the number rule).
    *
    * Scale: ONE aggregation over the redact scan computes all 2·|rules|
    * totals (map-side combined); the per-rule unpivot happens on the
    * single result row.
    */
  def auditSummary(df: DataFrame, textCol: String,
                   rules: Seq[Rule] = defaultRules): DataFrame = {
    val r = redact(df, textCol, rules)
    val aggs = rules.flatMap(rule => Seq(
      sum(when(col(s"n_${rule.name}") > 0, 1L).otherwise(0L))
        .as(s"${rule.name}__docs"),
      sum(col(s"n_${rule.name}")).as(s"${rule.name}__hits")))
    val wide = graft.catalog.ParquetCatalog.localized(
      r.agg(aggs.head, aggs.tail: _*))
    rules.map(rule =>
      wide.select(
        lit(rule.name).as("rule"),
        col(s"${rule.name}__docs").as("n_docs"),
        col(s"${rule.name}__hits").as("n_hits")))
      .reduce(_ unionByName _)
  }

  /** DuckDB SQL fragment mirroring [[redact]] for one rule application:
    * the caller nests these in rule order.
    */
  def redactSql(inner: String, rule: Rule): String =
    s"regexp_replace($inner, '${rule.pattern}', '${rule.mask}', 'g')"

  def matchCountSql(inner: String, rule: Rule): String =
    s"CAST(len(regexp_extract_all($inner, '${rule.pattern}')) AS BIGINT)"
}
