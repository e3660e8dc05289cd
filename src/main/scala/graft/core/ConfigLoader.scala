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

  /** Wildcard indicator → anchored regex, exactly like
    * pattern_config.py:321-336 (P6): `*` → `.*` with a full IGNORECASE
    * match; entries WITHOUT `*` compare as exact case-SENSITIVE equality
    * (`text == pattern`) — the reference lowercases the column name before
    * matching, so apply these regexes to the lowercased name.
    */
  def wildcardToRegex(pattern: String): String =
    if (pattern.contains("*")) "(?i)^" + pattern.replace("*", ".*") + "$"
    else "^" + java.util.regex.Pattern.quote(pattern) + "$"

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
    * preferred_detection_methods}`, the full `data_testing` breadth
    * (pattern_config.py:29-38 / :118-130),
    * `column_patterns.{primary_key_indicators, foreign_key_indicators}`
    * (wildcards translated via [[wildcardToRegex]]), per-class
    * `table_patterns` (pattern_config.py:96-106), `confidence_scoring`
    * per-method overrides, and `performance.cache_ttl_hours`. Keys absent
    * from the file keep `base`'s value, mirroring pattern_config.py's
    * defaulting.
    */
  def loadPatternConfig(path: String, base: DetectionConfig = DetectionConfig()): DetectionConfig = {
    val root = parseFile(path)
    val filtering = root \ "filtering_rules"
    val colPatterns = root \ "column_patterns"
    val dataTesting = root \ "data_testing"
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
        dbl(dataTesting \ "confidence_threshold").getOrElse(base.dataTestPassThreshold),
      dataTestEnabled = dataTesting \ "enabled" match {
        case JBool(b) => b
        case _ => base.dataTestEnabled
      },
      dataTestSampleSize =
        dbl(dataTesting \ "sample_size").map(_.toLong).getOrElse(base.dataTestSampleSize),
      maxOrphanPercentage =
        dbl(dataTesting \ "max_orphan_percentage").getOrElse(base.maxOrphanPercentage),
      distributionSimilarityThreshold =
        dbl(dataTesting \ "distribution_similarity_threshold")
          .getOrElse(base.distributionSimilarityThreshold),
      pkIndicatorRegexes =
        strs(colPatterns \ "primary_key_indicators").map(wildcardToRegex),
      fkIndicatorRegexes =
        strs(colPatterns \ "foreign_key_indicators").map(wildcardToRegex),
      tablePatterns = loadTablePatterns(root),
      confidenceScoring = root \ "confidence_scoring" match {
        case JObject(fields) =>
          fields.collect { case (k, v) if dbl(v).isDefined => k -> dbl(v).get }.toMap
        case _ => base.confidenceScoring
      },
      cacheEnabled = root \ "performance" \ "cache_enabled" match {
        case JBool(b) => b
        case _ => base.cacheEnabled
      },
      cacheTtlHours =
        int(root \ "performance" \ "cache_ttl_hours").getOrElse(base.cacheTtlHours))
  }

  /** `table_patterns.{methodology}.patterns.{name}` → flat [[TablePattern]]
    * list in file order (pattern_config.py:96-106's nested dict walk).
    */
  private def loadTablePatterns(root: JValue): Seq[TablePattern] =
    root \ "table_patterns" match {
      case JObject(methodologies) => methodologies.flatMap { case (meth, mval) =>
        mval \ "patterns" match {
          case JObject(patterns) => patterns.flatMap { case (name, p) =>
            str(p \ "prefix").map { prefix =>
              val rules = p \ "relationship_rules"
              TablePattern(
                methodology = meth,
                name = name,
                prefix = prefix,
                pkPatterns = strs(p \ "primary_key_patterns"),
                fkPatterns = strs(p \ "foreign_key_patterns"),
                relTargetTables = strs(rules \ "target_tables"),
                relType = str(rules \ "relationship_type")
                  .getOrElse(RelationshipType.ManyToOne),
                relConfidence = dbl(rules \ "confidence").getOrElse(0.8))
            }
          }
          case _ => Nil
        }
      }
      case _ => Nil
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
