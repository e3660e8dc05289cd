package graft.analyze

import graft.SparkSpec
import graft.core.ColumnRef
import org.apache.spark.sql.functions.col

/** Fixtures from FIXTURES.md §1-2 (the reference's de-facto behavioral
  * spec: test_enhanced_features.py:123-142, test_config.py:22-29).
  */
class KeyClassifierSpec extends SparkSpec {

  private def refs(rows: (String, String, String)*): Seq[ColumnRef] =
    rows.zipWithIndex.map { case ((t, c, dt), i) =>
      ColumnRef(t, c, dt, nullable = true, isArray = false, ordinal = i, numRows = 100L)
    }

  private def classify(rows: Seq[ColumnRef]) = {
    import spark.implicits._
    KeyClassifier.classify(spark.createDataset(rows).toDF()).cache()
  }

  test("data-vault fixture: h_customer/dim_customer PKs detected") {
    val out = classify(refs(
      ("h_customer", "id", "string"),
      ("h_customer", "business_key", "string"),
      ("dim_customer", "customer_id", "string"),
      ("dim_customer", "name", "string"),
      ("l_order", "customer_hk", "string"),
      ("l_order", "order_id", "string")))
    val pks = out.filter(col("is_pk_candidate"))
      .select("tableName", "columnName").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pks.contains(("h_customer", "id")))
    assert(pks.contains(("dim_customer", "customer_id")))
    assert(pks.contains(("l_order", "order_id"))) // order_id stems l_order's base
    val fks = out.filter(col("is_fk_candidate"))
      .select("tableName", "columnName").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fks.contains(("l_order", "customer_hk")))
    assert(!fks.contains(("dim_customer", "name")))
  }

  test("wildcard indicators: customer_* PK and *_ref FK patterns extend the heuristics") {
    import spark.implicits._
    import graft.core.{ConfigLoader, DetectionConfig}
    val rows = refs(
      ("customer", "customer_code", "string"), // no built-in key suffix
      ("customer", "customer_name", "string"),
      ("orders", "buyer_ref", "bigint"), // `ref` is not a built-in suffix
      ("orders", "note", "string"))
    val cfg = DetectionConfig(
      pkIndicatorRegexes = Seq("customer_c*").map(ConfigLoader.wildcardToRegex),
      fkIndicatorRegexes = Seq("*_ref").map(ConfigLoader.wildcardToRegex))
    val out = KeyClassifier.classify(spark.createDataset(rows).toDF(), cfg)
    val pks = out.filter(col("is_pk_candidate"))
      .select("columnName").collect().map(_.getString(0)).toSet
    val fks = out.filter(col("is_fk_candidate"))
      .select("columnName").collect().map(_.getString(0)).toSet
    assert(pks === Set("customer_code"))
    assert(fks === Set("buyer_ref"))
    // without indicators nothing here is key-flagged (regression guard)
    val plain = KeyClassifier.classify(spark.createDataset(rows).toDF())
    assert(plain.filter(col("is_pk_candidate") || col("is_fk_candidate")).count() === 0)
  }

  test("table_patterns: per-prefix PK/FK patterns fire only for matching tables") {
    import spark.implicits._
    import graft.core.{DetectionConfig, TablePattern}
    // `*_code` / `*_ref` are NOT built-in key suffixes, so nothing below is
    // flagged without config (guarded at the end); with table_patterns the
    // class prefix gates which tables gain the extra patterns
    // (pattern_config.py:187-239).
    val rows = refs(
      ("ref_region", "region_code", "string"), // PK via reference-class pattern
      ("plain", "region_code", "string"), // same column, wrong prefix
      ("fact_sales", "customer_ref", "bigint"), // FK via fact-class pattern
      ("plain", "customer_ref", "bigint"))
    val cfg = DetectionConfig(tablePatterns = Seq(
      TablePattern("data_vault", "reference", "ref_", pkPatterns = Seq("*_code")),
      TablePattern("traditional_dw", "fact", "fact_", fkPatterns = Seq("*_ref"))))
    val out = KeyClassifier.classify(spark.createDataset(rows).toDF(), cfg)
    val pks = out.filter(col("is_pk_candidate"))
      .select("tableName", "columnName").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val fks = out.filter(col("is_fk_candidate"))
      .select("tableName", "columnName").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pks === Set(("ref_region", "region_code")))
    assert(fks === Set(("fact_sales", "customer_ref")))
    val plain = KeyClassifier.classify(spark.createDataset(rows).toDF())
    assert(plain.filter(col("is_pk_candidate") || col("is_fk_candidate")).count() === 0)
  }

  test("e-commerce fixture: users.id PK, orders.customer_id FK") {
    val out = classify(refs(
      ("users", "id", "bigint"),
      ("users", "name", "string"),
      ("orders", "id", "bigint"),
      ("orders", "customer_id", "bigint")))
    assert(out.filter(col("is_pk_candidate")).count() === 2) // both `id`s
    val fks = out.filter(col("is_fk_candidate"))
      .select("columnName").collect().map(_.getString(0)).toSet
    assert(fks === Set("customer_id"))
  }

  test("REPEATED (array) columns are never key candidates") {
    import spark.implicits._
    val rows = Seq(
      ColumnRef("t", "tag_ids", "bigint", nullable = true, isArray = true, 0, 10L))
    val out = KeyClassifier.classify(spark.createDataset(rows).toDF())
    assert(out.filter(col("is_pk_candidate") || col("is_fk_candidate")).count() === 0)
  }

  test("non-key types are never key candidates") {
    val out = classify(refs(("t", "amount_id", "double")))
    assert(out.filter(col("is_pk_candidate") || col("is_fk_candidate")).count() === 0)
  }

  test("TPC-H style prefixes: o_custkey bases to custkey, stems to cust") {
    val out = classify(refs(("orders", "o_custkey", "bigint")))
    val r = out.select("base_name", "key_stem", "is_fk_candidate").collect().head
    assert(r.getString(0) === "custkey")
    assert(r.getString(1) === "cust")
    assert(r.getBoolean(2))
  }
}
