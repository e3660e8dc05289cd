package graft.render

import graft.core.{Relationship, TableMeta}

/** ERD rendering (SURVEY §2.7 F10-F12, §3.1 stage 5) — driver-side string
  * generation in the reference's three output dialects
  * (mermaid_formatter/plantuml_formatter/drawio_formatter). Inputs are the
  * tiny post-top-k results collected to the driver; rendering is inherently
  * single-node (S11).
  *
  * All output is deterministically ordered (tables by name, columns by
  * ordinal, edges by endpoint tuple) so renders are golden-testable under
  * any execution order — the distributed-determinism requirement of SURVEY
  * §7.4.2.
  */
object ErdRenderer {

  private def sortedTables(tables: Seq[TableMeta]) = tables.sortBy(_.tableName)

  private def sortedRels(rels: Seq[Relationship]) =
    rels.sortBy(r => (r.sourceTable, r.sourceColumn, r.targetTable, r.targetColumn))

  /** Mermaid `erDiagram` (mermaid_formatter analog). */
  def mermaid(tables: Seq[TableMeta], rels: Seq[Relationship],
      pkCols: Set[(String, String)] = Set.empty,
      fkCols: Set[(String, String)] = Set.empty): String = {
    val sb = new StringBuilder("erDiagram\n")
    sortedTables(tables).foreach { t =>
      sb.append(s"    ${t.tableName} {\n")
      t.columns.sortBy(_.ordinal).foreach { c =>
        val marks =
          (if (pkCols((t.tableName, c.name))) " PK" else "") +
            (if (fkCols((t.tableName, c.name))) " FK" else "")
        sb.append(s"        ${c.dataType} ${c.name}$marks\n")
      }
      sb.append("    }\n")
    }
    sortedRels(rels).foreach { r =>
      val card = r.relationshipType match {
        case "one_to_one"  => "||--||"
        case "one_to_many" => "||--o{"
        case "many_to_one" => "}o--||"
        case _             => "}o--o{"
      }
      sb.append(s"""    ${r.sourceTable} $card ${r.targetTable} : "${r.sourceColumn}"\n""")
    }
    sb.toString
  }

  /** PlantUML entity diagram (plantuml_formatter analog). */
  def plantUml(tables: Seq[TableMeta], rels: Seq[Relationship],
      pkCols: Set[(String, String)] = Set.empty): String = {
    val sb = new StringBuilder("@startuml\nhide circle\nskinparam linetype ortho\n\n")
    sortedTables(tables).foreach { t =>
      sb.append(s"entity ${t.tableName} {\n")
      val (pks, rest) = t.columns.sortBy(_.ordinal).partition(c => pkCols((t.tableName, c.name)))
      pks.foreach(c => sb.append(s"  * ${c.name} : ${c.dataType}\n"))
      if (pks.nonEmpty) sb.append("  --\n")
      rest.foreach(c => sb.append(s"  ${c.name} : ${c.dataType}\n"))
      sb.append("}\n\n")
    }
    sortedRels(rels).foreach { r =>
      sb.append(s"${r.sourceTable} }o--|| ${r.targetTable} : ${r.sourceColumn}\n")
    }
    sb.append("@enduml\n")
    sb.toString
  }

  /** draw.io mxfile XML (drawio_formatter.py:40-119 analog): one swimlane
    * node per table on a deterministic grid layout, one styled edge per
    * relationship; confidence drives edge colour
    * (drawio_formatter.py:240-272's CASE styling).
    */
  def drawio(tables: Seq[TableMeta], rels: Seq[Relationship],
      maxColumnsShown: Int = 6): String = {
    val ts = sortedTables(tables)
    val cellW = 200
    val cellH = 30
    val gridCols = math.max(1, math.ceil(math.sqrt(ts.size.toDouble)).toInt)
    val sb = new StringBuilder
    sb.append("<mxfile host=\"app.diagrams.net\"><diagram name=\"ERD\">")
    sb.append("<mxGraphModel><root><mxCell id=\"0\"/><mxCell id=\"1\" parent=\"0\"/>")
    ts.zipWithIndex.foreach { case (t, i) =>
      val x = (i % gridCols) * (cellW + 60) + 40
      val y = (i / gridCols) * 260 + 40
      val shown = t.columns.sortBy(_.ordinal).take(maxColumnsShown)
      val h = cellH * (shown.size + 1)
      sb.append(
        s"""<mxCell id="tbl_${t.tableName}" value="${t.tableName}" style="swimlane" vertex="1" parent="1">""" +
          s"""<mxGeometry x="$x" y="$y" width="$cellW" height="$h" as="geometry"/></mxCell>""")
      shown.zipWithIndex.foreach { case (c, j) =>
        sb.append(
          s"""<mxCell id="col_${t.tableName}_${c.name}" value="${c.name}: ${c.dataType}" style="text" vertex="1" parent="tbl_${t.tableName}">""" +
            s"""<mxGeometry y="${cellH * (j + 1)}" width="$cellW" height="$cellH" as="geometry"/></mxCell>""")
      }
    }
    sortedRels(rels).zipWithIndex.foreach { case (r, i) =>
      val color =
        if (r.confidence >= 0.9) "#00AA00"
        else if (r.confidence >= 0.7) "#FF8800"
        else "#CC0000"
      sb.append(
        s"""<mxCell id="rel_$i" style="edgeStyle=orthogonalEdgeStyle;strokeColor=$color" edge="1" parent="1" source="tbl_${r.sourceTable}" target="tbl_${r.targetTable}">""" +
          """<mxGeometry relative="1" as="geometry"/></mxCell>""")
    }
    sb.append("</root></mxGraphModel></diagram></mxfile>")
    sb.toString
  }

  /** Hierarchical layout order: Kahn toposort over the relationship graph
    * (erd_generator.py:288-326's intent, fixing its bug where non-root
    * tables never enter the level map — SURVEY §2.11). Cycles fall back to
    * name order at the end.
    */
  def topologicalLevels(
      tables: Seq[String], rels: Seq[Relationship]): Map[String, Int] = {
    val deps = rels.groupBy(_.sourceTable).view.mapValues(_.map(_.targetTable).toSet).toMap
    var level = Map.empty[String, Int]
    var remaining = tables.toSet
    var current = 0
    var progressed = true
    while (remaining.nonEmpty && progressed) {
      val ready = remaining.filter(t => deps.getOrElse(t, Set.empty).forall(!remaining.contains(_)))
      progressed = ready.nonEmpty
      ready.toSeq.sorted.foreach(t => level += t -> current)
      remaining --= ready
      current += 1
    }
    remaining.toSeq.sorted.foreach(t => level += t -> current) // cycle fallback
    level
  }
}
