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

  test("drawio display toggles: theme colours, column types, nullable markers") {
    val default = ErdRenderer.drawio(tables, rels)
    // default stays byte-stable: bare swimlane style, typed labels, no NULL
    assert(default.contains("""style="swimlane""""))
    assert(default.contains("value=\"id: bigint\""))
    assert(!default.contains(" NULL"))
    val dark = ErdRenderer.drawio(tables, rels, theme = "dark")
    assert(dark.contains("swimlane;fillColor=#2d2d2d;strokeColor=#666666;fontColor=#ffffff"))
    val minimal = ErdRenderer.drawio(tables, rels, theme = "minimal")
    assert(minimal.contains("swimlane;fillColor=#ffffff;strokeColor=#000000;fontColor=#000000"))
    val untyped = ErdRenderer.drawio(tables, rels, showColumnTypes = false)
    assert(untyped.contains("value=\"id\"") && !untyped.contains("id: bigint"))
    val nullable = ErdRenderer.drawio(tables, rels, showNullable = true)
    assert(nullable.contains("value=\"customer_id: bigint NULL\"")) // the one nullable col
    assert(nullable.contains("value=\"id: bigint\"")) // non-null cols unmarked
    // every variant still parses as XML
    Seq(dark, minimal, untyped, nullable).foreach(x =>
      assert(scala.xml.XML.loadString(x) != null))
  }

  test("force-directed layout: deterministic, positive quadrant, pulls linked tables together") {
    def mkTable(n: String) = TableMeta(n, "p", "TABLE",
      Seq(ColumnMeta("id", "bigint", nullable = false, isArray = false, 0)), 1, 1)
    val four = Seq("a", "b", "c", "d").map(mkTable)
    val edge = Seq(Relationship("a", "id", "b", "id", "many_to_one", 0.9, "exact_match", false))
    // golden: two renders are byte-identical (no RNG in the physics)
    val x1 = ErdRenderer.drawio(four, edge, layout = "force")
    val x2 = ErdRenderer.drawio(four, edge, layout = "force")
    assert(x1 === x2)
    assert("""x="-""".r.findFirstIn(x1).isEmpty, "coordinates left the positive quadrant")
    // physics: the linked pair (a,b) ends closer than the unlinked pair (c,d)
    // started antipodal on the circle? a,b adjacent on circle; compare vs (a,c) antipodal-ish
    val pos = ErdRenderer.forceDirectedPositions(Seq("a", "b", "c", "d"), edge)
    def d(p: (Double, Double), q: (Double, Double)) =
      math.hypot(p._1 - q._1, p._2 - q._2)
    val unlinked = ErdRenderer.forceDirectedPositions(Seq("a", "b", "c", "d"), Nil)
    assert(d(pos("a"), pos("b")) < d(unlinked("a"), unlinked("b")),
      "attraction did not pull the linked pair together")
    // single table sits at the origin-shifted anchor (200,0) → (40,40)
    val solo = ErdRenderer.drawio(Seq(mkTable("solo")), Nil, layout = "force")
    assert(solo.contains("""<mxGeometry x="40" y="40""""))
  }

  test("hierarchical layout: referenced tables render above their referrers") {
    val xml = ErdRenderer.drawio(tables, rels, layout = "hierarchical")
    val yOf = """id="tbl_(\w+)" [^>]*>(<mxGeometry x="\d+" y="(\d+)")""".r
    val ys = yOf.findAllMatchIn(xml).map(m => m.group(1) -> m.group(3).toInt).toMap
    assert(ys("customers") < ys("orders"), s"expected customers above orders: $ys")
    // default layout unchanged (q39 regression guard): grid stays grid
    val grid = ErdRenderer.drawio(tables, rels)
    assert(grid.contains("""<mxGeometry x="40" y="40""""))
    assert(grid !== xml)
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
