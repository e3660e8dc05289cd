package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON config sources (SURVEY §2 S8) — the reference's config-as-data entry
  * points, so a user can port their existing JSON files verbatim:
  *
  *   - `relationship_patterns.json` (pattern_config.py:84-154): filtering
  *     rules, confidence thresholds, and wildcard PK/FK column indicators
  *     (config/relationship_patterns.json:158-282);
  *   - `relationship_rules.json` (config.py:67-87; models.py:153-168;
  *     examples/relationship_rules.json): explicit custom edges plus
  *     naming-pattern rules.
  *
  * Driver-side only: config files are a few KB read once at plan-build time;
  * the values compile into Catalyst expressions downstream.
  */
object ConfigLoader {

  /** Wildcard indicator → anchored case-insensitive regex, exactly like
    * pattern_config.py:321-336 (P6): `*` → `.*` with a full IGNORECASE
    * match; entries without `*` compare as exact (quoted) names.
    */
  def wildcardToRegex(pattern: String): String =
    if (pattern.contains("*")) "(?i)^" + pattern.replace("*", ".*") + "$"
    else "(?i)^" + java.util.regex.Pattern.quote(pattern) + "$"

  private def parseFile(path: String): JValue =
    JsonMethods.parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  private def str(j: JValue): Option[String] =
    j match { case JString(s) => Some(s); case _ => None }
  private def dbl(j: JValue): Option[Double] = j match {
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case _ => None
  }
  private def int(j: JValue): Option[Int] = dbl(j).map(_.toInt)
  private def strs(j: JValue): Seq[String] =
    j match { case JArray(xs) => xs.flatMap(str); case _ => Nil }

  /** Load a reference-shaped `relationship_patterns.json` over `base`:
    * `filtering_rules.{max_relationships_per_table, min_confidence_threshold,
    * preferred_detection_methods}`, `data_testing.confidence_threshold`, and
    * `column_patterns.{primary_key_indicators, foreign_key_indicators}`
    * (wildcards translated via [[wildcardToRegex]]). Keys absent from the
    * file keep `base`'s value, mirroring pattern_config.py's defaulting.
    */
  def loadPatternConfig(path: String, base: DetectionConfig = DetectionConfig()): DetectionConfig = {
    val root = parseFile(path)
    val filtering = root \ "filtering_rules"
    val colPatterns = root \ "column_patterns"
    base.copy(
      minConfidence =
        dbl(filtering \ "min_confidence_threshold").getOrElse(base.minConfidence),
      maxRelationshipsPerTable =
        int(filtering \ "max_relationships_per_table").getOrElse(base.maxRelationshipsPerTable),
      preferredMethods = filtering \ "preferred_detection_methods" match {
        case JArray(xs) => xs.flatMap(str)
        case _ => base.preferredMethods
      },
      dataTestPassThreshold =
        dbl(root \ "data_testing" \ "confidence_threshold").getOrElse(base.dataTestPassThreshold),
      pkIndicatorRegexes =
        strs(colPatterns \ "primary_key_indicators").map(wildcardToRegex),
      fkIndicatorRegexes =
        strs(colPatterns \ "foreign_key_indicators").map(wildcardToRegex))
  }

  /** Load a reference-shaped custom rules file
    * (`{"relationships": [...], "naming_patterns": [...]}`). A naming
    * pattern without a capture group is wrapped in one, matching the
    * reference's "group(1) if groups else full column name" semantics
    * (relationship_detector.py:698-700).
    */
  def loadCustomRules(path: String): (Seq[CustomRule], Seq[NamingRule]) = {
    val root = parseFile(path)
    val rules = root \ "relationships" match {
      case JArray(xs) => xs.flatMap { r =>
        for {
          st <- str(r \ "source_table"); sc <- str(r \ "source_column")
          tt <- str(r \ "target_table"); tc <- str(r \ "target_column")
        } yield CustomRule(st, sc, tt, tc,
          str(r \ "relationship_type").getOrElse(RelationshipType.ManyToOne),
          dbl(r \ "confidence").getOrElse(0.9))
      }
      case _ => Nil
    }
    val naming = root \ "naming_patterns" match {
      case JArray(xs) => xs.flatMap { r =>
        str(r \ "pattern").map { p0 =>
          val p = if (p0.contains("(")) p0 else s"($p0)"
          NamingRule(p,
            str(r \ "target_suffix").getOrElse(""),
            dbl(r \ "confidence").getOrElse(0.8))
        }
      }
      case _ => Nil
    }
    (rules, naming)
  }
}
