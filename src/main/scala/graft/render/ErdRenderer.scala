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

  /** Force-directed positions (erd_generator.py:166-248 physics, made
    * deterministic): circle initialization in sorted-name order, 10 rounds
    * of pairwise repulsion (1000/d²) + per-edge attraction (0.1·d), step
    * 0.1. Driver-side O(n²·iters) over the post-top-k CATALOG (tables, not
    * data) — thousands of tables cost milliseconds; rendering is inherently
    * single-node (S11).
    */
  def forceDirectedPositions(
      tableNames: Seq[String],
      rels: Seq[Relationship],
      iterations: Int = 10): Map[String, (Double, Double)] = {
    val ts = tableNames.distinct.sorted
    val n = ts.size
    if (n == 0) return Map.empty
    var pos: Map[String, (Double, Double)] = ts.zipWithIndex.map { case (t, i) =>
      val angle = 2 * math.Pi * i / n
      t -> (200.0 * math.cos(angle), 200.0 * math.sin(angle))
    }.toMap
    for (_ <- 0 until iterations) {
      var fx = Map.empty[String, (Double, Double)].withDefaultValue((0.0, 0.0))
      def push(t: String, dx: Double, dy: Double): Unit = {
        val (x, y) = fx(t); fx += t -> (x + dx, y + dy)
      }
      for (i <- ts.indices; j <- i + 1 until n) {
        val (x1, y1) = pos(ts(i)); val (x2, y2) = pos(ts(j))
        val (dx, dy) = (x2 - x1, y2 - y1)
        val dist = math.sqrt(dx * dx + dy * dy)
        if (dist > 0) {
          val f = 1000.0 / (dist * dist)
          push(ts(i), -f * dx / dist, -f * dy / dist)
          push(ts(j), f * dx / dist, f * dy / dist)
        }
      }
      sortedRels(rels).foreach { r =>
        if (pos.contains(r.sourceTable) && pos.contains(r.targetTable)) {
          val (x1, y1) = pos(r.sourceTable); val (x2, y2) = pos(r.targetTable)
          val (dx, dy) = (x2 - x1, y2 - y1)
          val dist = math.sqrt(dx * dx + dy * dy)
          if (dist > 0) {
            val f = dist * 0.1
            push(r.sourceTable, f * dx / dist, f * dy / dist)
            push(r.targetTable, -f * dx / dist, -f * dy / dist)
          }
        }
      }
      pos = ts.map { t =>
        val (x, y) = pos(t); val (dx, dy) = fx(t)
        t -> (x + dx * 0.1, y + dy * 0.1)
      }.toMap
    }
    pos
  }

  /** draw.io mxfile XML (drawio_formatter.py:40-119 analog): one swimlane
    * node per table, one styled edge per relationship; confidence drives
    * edge colour (drawio_formatter.py:240-272's CASE styling). `layout`
    * picks coordinates: "grid" (default), "force" (forceDirectedPositions,
    * shifted into the positive quadrant), or "hierarchical"
    * (topologicalLevels drive rows: referenced dims end up above the facts
    * that point at them).
    *
    * Display toggles mirror ERDConfig (models.py:119-135):
    * `showColumnTypes` (show_column_types) includes the data type in each
    * column label; `showNullable` (show_column_nullable) appends " NULL" to
    * nullable columns — default OFF here where the reference defaults on,
    * keeping this renderer's established default output stable;
    * `theme` (drawio_theme: default | dark | minimal) appends the
    * reference's fill/stroke/font colours to the swimlane style
    * (drawio_formatter.py:231-237), with "default" preserving the bare
    * style byte-for-byte.
    */
  def drawio(tables: Seq[TableMeta], rels: Seq[Relationship],
      maxColumnsShown: Int = 6, layout: String = "grid",
      showColumnTypes: Boolean = true, showNullable: Boolean = false,
      theme: String = "default"): String = {
    val ts = sortedTables(tables)
    val cellW = 200
    val cellH = 30
    val gridCols = math.max(1, math.ceil(math.sqrt(ts.size.toDouble)).toInt)
    val coords: Int => (Int, Int) = layout match {
      case "force" =>
        val pos = forceDirectedPositions(ts.map(_.tableName), rels)
        val minX = pos.values.map(_._1).min
        val minY = pos.values.map(_._2).min
        i => {
          val (x, y) = pos(ts(i).tableName)
          (math.round(x - minX).toInt + 40, math.round(y - minY).toInt + 40)
        }
      case "hierarchical" =>
        val levels = topologicalLevels(ts.map(_.tableName), rels)
        val byLevel = ts.map(_.tableName).groupBy(levels)
        i => {
          val t = ts(i).tableName
          val lvl = levels(t)
          (byLevel(lvl).sorted.indexOf(t) * (cellW + 60) + 40, lvl * 260 + 40)
        }
      case _ =>
        i => ((i % gridCols) * (cellW + 60) + 40, (i / gridCols) * 260 + 40)
    }
    val tableStyle = "swimlane" + (theme match {
      case "dark"    => ";fillColor=#2d2d2d;strokeColor=#666666;fontColor=#ffffff"
      case "minimal" => ";fillColor=#ffffff;strokeColor=#000000;fontColor=#000000"
      case _         => ""
    })
    val sb = new StringBuilder
    sb.append("<mxfile host=\"app.diagrams.net\"><diagram name=\"ERD\">")
    sb.append("<mxGraphModel><root><mxCell id=\"0\"/><mxCell id=\"1\" parent=\"0\"/>")
    ts.zipWithIndex.foreach { case (t, i) =>
      val (x, y) = coords(i)
      val shown = t.columns.sortBy(_.ordinal).take(maxColumnsShown)
      val h = cellH * (shown.size + 1)
      sb.append(
        s"""<mxCell id="tbl_${t.tableName}" value="${t.tableName}" style="$tableStyle" vertex="1" parent="1">""" +
          s"""<mxGeometry x="$x" y="$y" width="$cellW" height="$h" as="geometry"/></mxCell>""")
      shown.zipWithIndex.foreach { case (c, j) =>
        val label = c.name +
          (if (showColumnTypes) s": ${c.dataType}" else "") +
          (if (showNullable && c.nullable) " NULL" else "")
        sb.append(
          s"""<mxCell id="col_${t.tableName}_${c.name}" value="$label" style="text" vertex="1" parent="tbl_${t.tableName}">""" +
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
