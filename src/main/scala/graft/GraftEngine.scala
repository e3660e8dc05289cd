package graft

import graft.analyze.KeyClassifier
import graft.catalog.ParquetCatalog
import graft.core._
import graft.datatest.DataTester
import graft.detect.RelationshipDetector
import graft.render.ErdRenderer
import graft.state.IncrementalState
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** End-to-end engine facade — the reference's main pipeline (main.py:78-306,
  * SURVEY §3.1-3.2) as one lazily-composed Spark job chain:
  *
  *   catalog scan → column explode → key classification → detection (all
  *   strategies ∪ → validate → resolve → top-k) → optional data testing with
  *   confidence adjustment → render / persist state.
  *
  * Only two engine-crossing points exist: the source scans and the final
  * collect into the (tiny, post-top-k) render model.
  */
class GraftEngine(
    val spark: SparkSession,
    val dir: String,
    val customRules: Seq[CustomRule] = Nil,
    val namingRules: Seq[NamingRule] = Nil,
    val cfg: DetectionConfig = DetectionConfig()) {

  lazy val catalog = ParquetCatalog.catalog(spark, dir)

  lazy val classifiedColumns: DataFrame = ParquetCatalog.localized(
    KeyClassifier.classify(ParquetCatalog.columnRefs(catalog).toDF(), cfg))

  /** Name-based detection only (RelationshipDetector path, §3.1 step 4). */
  lazy val relationships: DataFrame =
    RelationshipDetector.detect(classifiedColumns, customRules, namingRules, cfg)

  /** Enhanced path (§3.2): detection + per-edge data testing + confidence
    * adjustment, keeping edges that survive the threshold on ADJUSTED
    * confidence (enhanced_relationship_detector.py:137-251).
    */
  def enhancedRelationships(sampleFraction: Double = 1.0): DataFrame = {
    val edges = relationships.collect() // post-top-k: tiny
    if (edges.isEmpty) return relationships
    val tested = edges.toSeq.map { r =>
      DataTester.testRelationship(
        spark, dir,
        r.getAs[String]("source_table"), r.getAs[String]("source_column"),
        r.getAs[String]("target_table"), r.getAs[String]("target_column"),
        typeCompatible = true, sampleFraction)
        .withColumn("confidence", org.apache.spark.sql.functions.lit(r.getAs[Double]("confidence")))
        .withColumn("relationship_type",
          org.apache.spark.sql.functions.lit(r.getAs[String]("relationship_type")))
        .withColumn("detection_method",
          org.apache.spark.sql.functions.lit(r.getAs[String]("detection_method")))
        .withColumn("is_custom",
          org.apache.spark.sql.functions.lit(r.getAs[Boolean]("is_custom")))
    }.reduce(_ unionByName _)
    DataTester.adjustConfidence(tested, cfg)
      .filter(col("adjusted_confidence") >= cfg.minConfidence)
  }

  private def collectRelationships(df: DataFrame): Seq[Relationship] =
    df.collect().toSeq.map(r => Relationship(
      r.getAs[String]("source_table"), r.getAs[String]("source_column"),
      r.getAs[String]("target_table"), r.getAs[String]("target_column"),
      r.getAs[String]("relationship_type"), r.getAs[Double]("confidence"),
      r.getAs[String]("detection_method"), r.getAs[Boolean]("is_custom")))

  private def keySet(flag: String): Set[(String, String)] =
    classifiedColumns.filter(col(flag))
      .select("tableName", "columnName").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  /** Render the detected graph in the requested dialect (§3.1 steps 5-6). */
  def renderErd(format: String): String = {
    val tables = catalog.collect().toSeq
    val rels = collectRelationships(relationships)
    format match {
      case "mermaid" =>
        ErdRenderer.mermaid(tables, rels, keySet("is_pk_candidate"), keySet("is_fk_candidate"))
      case "plantuml" => ErdRenderer.plantUml(tables, rels, keySet("is_pk_candidate"))
      case "drawio"   => ErdRenderer.drawio(tables, rels)
      case other      => throw new IllegalArgumentException(s"unknown format: $other")
    }
  }

  /** Incremental gate: tables whose schema changed since the stored state
    * (§3.2 step 1).
    */
  def changedTables(statePath: String): DataFrame =
    IncrementalState.tablesToProcess(
      IncrementalState.schemaChecksums(catalog),
      IncrementalState.loadState(spark, statePath))

  def saveProcessedState(statePath: String, nowMs: Long): Unit =
    IncrementalState.saveState(
      IncrementalState.schemaChecksums(catalog),
      IncrementalState.loadState(spark, statePath), statePath, nowMs)

  /** SQL surface: register every catalog table as a temp view and run ANSI
    * SQL against the lake — the `spark.sql` face of the engine (views are
    * lazy; Catalyst still sees the parquet scans for pushdown/pruning).
    */
  def sql(query: String): DataFrame = {
    registerViews()
    spark.sql(query)
  }

  def registerViews(): Unit =
    catalog.collect().foreach { t =>
      spark.read.parquet(t.path).createOrReplaceTempView(t.tableName)
    }
}

/** CLI mirroring the reference's entry point options (main.py:119-151):
  *   graft.Main <dataDir> [--format mermaid|plantuml|drawio]
  *              [--out FILE] [--min-confidence X] [--max-per-table K]
  *              [--enhanced] [--state PATH]
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: graft.Main <dataDir> [--format mermaid|plantuml|drawio] " +
          "[--out FILE] [--min-confidence X] [--max-per-table K] [--enhanced] [--state PATH]")
      sys.exit(2)
    }
    val dir = args(0)
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val format = opt("--format").getOrElse("mermaid")
    val cfg = DetectionConfig(
      minConfidence = opt("--min-confidence").map(_.toDouble).getOrElse(0.5),
      maxRelationshipsPerTable = opt("--max-per-table").map(_.toInt).getOrElse(3))

    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val engine = new GraftEngine(spark, dir, cfg = cfg)
      val rels =
        if (args.contains("--enhanced")) engine.enhancedRelationships()
        else engine.relationships
      println(s"detected ${rels.count()} relationships:")
      rels.show(100, truncate = false)
      val erd = engine.renderErd(format)
      opt("--out") match {
        case Some(f) =>
          java.nio.file.Files.writeString(java.nio.file.Paths.get(f), erd)
          println(s"wrote $format ERD to $f")
        case None => println(erd)
      }
      opt("--state").foreach { p =>
        engine.saveProcessedState(p, System.currentTimeMillis())
        println(s"state saved to $p")
      }
    } finally spark.stop()
  }
}
