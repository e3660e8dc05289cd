package graft.render

import graft.SparkSpec
import graft.core.{ColumnMeta, Relationship, TableMeta}

class ErdRendererSpec extends SparkSpec {

  private val tables = Seq(
    TableMeta("orders", "p", "TABLE",
      Seq(ColumnMeta("id", "bigint", nullable = false, isArray = false, 0),
        ColumnMeta("customer_id", "bigint", nullable = true, isArray = false, 1)), 10, 100),
    TableMeta("customers", "p", "TABLE",
      Seq(ColumnMeta("id", "bigint", nullable = false, isArray = false, 0)), 5, 50))

  private val rels = Seq(
    Relationship("orders", "customer_id", "customers", "id", "many_to_one",
      0.9, "custom_rule", isCustom = true))

  test("mermaid output is deterministic and structured") {
    val out = ErdRenderer.mermaid(tables, rels,
      pkCols = Set(("orders", "id"), ("customers", "id")),
      fkCols = Set(("orders", "customer_id")))
    assert(out.startsWith("erDiagram\n"))
    // tables sorted by name: customers before orders
    assert(out.indexOf("customers {") < out.indexOf("orders {"))
    assert(out.contains("bigint id PK"))
    assert(out.contains("bigint customer_id FK"))
    assert(out.contains("""orders }o--|| customers : "customer_id""""))
  }

  test("plantuml separates PKs above the divider") {
    val out = ErdRenderer.plantUml(tables, rels, pkCols = Set(("orders", "id")))
    assert(out.startsWith("@startuml"))
    assert(out.contains("* id : bigint"))
    assert(out.contains("orders }o--|| customers : customer_id"))
    assert(out.endsWith("@enduml\n"))
  }

  test("drawio XML carries one node per table, one edge per relationship, confidence colour") {
    val out = ErdRenderer.drawio(tables, rels)
    assert(out.contains("""<mxCell id="tbl_orders""""))
    assert(out.contains("""<mxCell id="tbl_customers""""))
    assert(out.contains("strokeColor=#00AA00")) // 0.9 => green band
    assert(out.count(_ == '<') === out.count(_ == '>')) // well-formed-ish
    assert(scala.xml.XML.loadString(out) != null) // parses as XML
  }

  test("topological levels: targets first, fixing the reference's level bug") {
    val levels = ErdRenderer.topologicalLevels(
      Seq("orders", "customers", "lineitem"),
      rels :+ Relationship("lineitem", "order_id", "orders", "id", "many_to_one",
        0.9, "exact_match", isCustom = false))
    assert(levels("customers") === 0)
    assert(levels("orders") === 1)
    assert(levels("lineitem") === 2)
  }

  test("cycles fall back instead of looping forever") {
    val cyc = Seq(
      Relationship("a", "x", "b", "y", "many_to_one", 0.9, "m", isCustom = false),
      Relationship("b", "y", "a", "x", "many_to_one", 0.9, "m", isCustom = false))
    val levels = ErdRenderer.topologicalLevels(Seq("a", "b"), cyc)
    assert(levels.size === 2)
  }
}
