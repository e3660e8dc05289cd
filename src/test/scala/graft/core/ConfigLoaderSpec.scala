package graft.core

import graft.SparkSpec
import graft.analyze.KeyClassifier
import graft.catalog.ParquetCatalog
import graft.detect.RelationshipDetector

/** S8/P6 — JSON config sources: a user's reference-shaped
  * `relationship_patterns.json` / `relationship_rules.json` load into the
  * same DetectionConfig/CustomRule/NamingRule values they would construct in
  * code, and drive detection to identical output.
  */
class ConfigLoaderSpec extends SparkSpec {

  private def write(name: String, content: String): String = {
    val p = java.nio.file.Files.createTempFile(name, ".json")
    java.nio.file.Files.writeString(p, content)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("wildcardToRegex: * translates, non-wildcards are exact, case-insensitive") {
    def m(p: String, s: String) = s.matches(ConfigLoader.wildcardToRegex(p))
    assert(m("*_id", "customer_id"))
    assert(m("*_id", "CUSTOMER_ID"))
    assert(!m("*_id", "customer_identity"))
    assert(m("customer_*", "customer_code"))
    assert(m("id", "ID"))
    assert(!m("id", "order_id")) // exact, not substring
  }

  test("pattern config file: filtering rules, thresholds, indicators load over defaults") {
    val path = write("patterns", """{
      "column_patterns": {
        "primary_key_indicators": ["id", "key", "hash_key"],
        "foreign_key_indicators": ["*_id", "*_hk"]
      },
      "filtering_rules": {
        "max_relationships_per_table": 5,
        "min_confidence_threshold": 0.6,
        "preferred_detection_methods": ["enhanced_pk_fk"]
      },
      "data_testing": {"confidence_threshold": 0.8}
    }""")
    val cfg = ConfigLoader.loadPatternConfig(path)
    assert(cfg.maxRelationshipsPerTable === 5)
    assert(cfg.minConfidence === 0.6)
    assert(cfg.preferredMethods === Seq("enhanced_pk_fk"))
    assert(cfg.dataTestPassThreshold === 0.8)
    assert(cfg.pkIndicatorRegexes === Seq("id", "key", "hash_key").map(ConfigLoader.wildcardToRegex))
    assert(cfg.fkIndicatorRegexes === Seq("*_id", "*_hk").map(ConfigLoader.wildcardToRegex))
    // untouched keys keep defaults
    assert(cfg.backfillMin === DetectionConfig().backfillMin)
  }

  test("custom rules file: reference key names load as CustomRule/NamingRule") {
    val path = write("rules", """{
      "relationships": [
        {"source_table": "events", "source_column": "user_id",
         "target_table": "customer", "target_column": "c_custkey",
         "relationship_type": "many_to_one", "confidence": 0.9}
      ],
      "naming_patterns": [
        {"pattern": "^(.+)_id$", "target_suffix": "s", "confidence": 0.8},
        {"pattern": ".*_key$", "target_suffix": "", "confidence": 0.7}
      ]
    }""")
    val (rules, naming) = ConfigLoader.loadCustomRules(path)
    assert(rules === Seq(CustomRule("events", "user_id", "customer", "c_custkey")))
    assert(naming.head === NamingRule("^(.+)_id$", "s", 0.8))
    // group-less pattern gets wrapped so group(1) = full name (reference
    // relationship_detector.py:698-700 semantics)
    assert(naming(1) === NamingRule("(.*_key$)", "", 0.7))
  }

  test("file-loaded config detects identically to code-constructed config on sf0.001") {
    val rulesPath = write("rules2", """{
      "relationships": [
        {"source_table": "events", "source_column": "user_id",
         "target_table": "customer", "target_column": "c_custkey"}
      ]
    }""")
    val patternsPath = write("patterns2", """{
      "filtering_rules": {"max_relationships_per_table": 3,
                          "min_confidence_threshold": 0.5}
    }""")
    val cols = KeyClassifier.classify(
      ParquetCatalog.columnRefs(ParquetCatalog.catalog(spark, sf0001)).toDF())
    val (loadedRules, loadedNaming) = ConfigLoader.loadCustomRules(rulesPath)
    val fromFile = RelationshipDetector
      .detect(cols, loadedRules, loadedNaming, ConfigLoader.loadPatternConfig(patternsPath))
      .collect().toSet
    val fromCode = RelationshipDetector
      .detect(cols, Seq(CustomRule("events", "user_id", "customer", "c_custkey")), Nil,
        DetectionConfig())
      .collect().toSet
    assert(fromFile === fromCode)
    assert(fromFile.nonEmpty)
  }
}
