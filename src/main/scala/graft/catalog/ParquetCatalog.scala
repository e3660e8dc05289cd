package graft.catalog

import java.io.File

import graft.core.{ColumnMeta, ColumnRef, TableMeta}
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Catalog source over a directory of parquet tables ("file lake").
  *
  * Re-expresses the reference's catalog scans (S1-S5:
  * bigquery_connector.py:63-240, bq_cli_connector.py:50-243) for a
  * parquet-on-object-store lake: the table list is a directory listing, the
  * schema comes from the parquet FOOTER only (no data pages read — the
  * metadata-only access path the reference gets from the BigQuery API), and
  * numRows/numBytes come from footer row-group metadata.
  *
  * Scale note: footer reads are O(#tables) driver-side metadata operations,
  * not data scans — same cost profile at 100 TB as at 1 GB. The resulting
  * catalog is a small Dataset, so every downstream analysis (key
  * classification, relationship detection) is a Spark job over catalog rows
  * and broadcast-joins for free.
  */
object ParquetCatalog {

  /** S1: enumerate tables in a directory (one `<name>.parquet` file or
    * directory per table), bounded like the reference's MAX_RESULTS
    * (config.py:45).
    */
  def listTables(dir: String, maxResults: Int = 1000): Seq[String] =
    new File(dir)
      .listFiles()
      .toSeq
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet"))
      .sorted
      .take(maxResults)

  /** P8: table types from an optional `_tabletypes.json` sidecar in the data
    * directory (`{"name": "VIEW" | "EXTERNAL", ...}`) — the parquet-lake
    * stand-in for the table_type field the reference reads off the BigQuery
    * API (bigquery_connector.py:222-233). Absent sidecar / absent entry →
    * "TABLE".
    */
  def tableTypes(dir: String): Map[String, String] = {
    val f = new File(dir, "_tabletypes.json")
    if (!f.exists()) Map.empty
    else {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(
        java.nio.file.Files.readString(f.toPath)) match {
        case JObject(fields) =>
          fields.collect { case (k, JString(v)) => k -> v.toUpperCase }.toMap
        case _ => Map.empty
      }
    }
  }

  /** S2+S3: schema + stats for one table, footer-only. `types` takes the
    * directory's sidecar map so catalog construction parses
    * `_tabletypes.json` once, not once per table.
    */
  def tableMeta(spark: SparkSession, dir: String, name: String,
      types: Map[String, String]): TableMeta = {
    val path = s"$dir/$name.parquet"
    val schema = spark.read.parquet(path).schema
    val (rows, bytes) = footerStats(path)
    TableMeta(name, path, types.getOrElse(name, "TABLE"),
      toColumnMeta(schema), rows, bytes)
  }

  def tableMeta(spark: SparkSession, dir: String, name: String): TableMeta =
    tableMeta(spark, dir, name, tableTypes(dir))

  /** Canonical type names: NTZ/LTZ timestamps collapse to "timestamp",
    * decimals lose their precision suffix — key analysis cares about type
    * GROUPS (relationship_detector.py:929-935), not physical variants.
    */
  private def canonType(name: String): String = name match {
    case "long"                         => "bigint"
    case t if t.startsWith("timestamp") => "timestamp"
    case t if t.startsWith("decimal")   => "decimal"
    case t if t.startsWith("varchar") || t == "char" => "string"
    case t => t
  }

  /** Flatten a schema into leaf columns with dotted paths: nested STRUCT
    * fields become `parent.child` entries so key analysis sees them — the
    * nested-fields support the reference lists as a future enhancement
    * (README.md:186; its connector reads only top-level fields,
    * bigquery_connector.py:121-131). A field anywhere under an array keeps
    * isArray=true, preserving the REPEATED-disqualifies-keys rule
    * (schema_analyzer.py:178-179).
    */
  private def toColumnMeta(schema: StructType): Seq[ColumnMeta] = {
    def leaves(prefix: String, st: StructType, inArray: Boolean): Seq[(String, String, Boolean, Boolean)] =
      st.fields.toSeq.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case nested: StructType => leaves(path, nested, inArray)
          case ArrayType(nested: StructType, _) => leaves(path, nested, inArray = true)
          case ArrayType(et, _) => Seq((path, canonType(et.typeName), f.nullable, true))
          case dt => Seq((path, canonType(dt.typeName), f.nullable, inArray))
        }
      }
    leaves("", schema, inArray = false).zipWithIndex.map {
      case ((name, tpe, nullable, isArray), i) =>
        ColumnMeta(name, tpe, nullable, isArray, i)
    }
  }

  /** Row count + byte size from parquet footers; no data pages are read. */
  private def footerStats(path: String): (Long, Long) = {
    val f = new File(path)
    val files =
      if (f.isDirectory) f.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      else Seq(f)
    val conf = new Configuration()
    var rows = 0L
    var bytes = 0L
    files.foreach { part =>
      val in = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(part.getPath), conf)
      val reader = ParquetFileReader.open(in)
      try {
        rows += reader.getRecordCount
        bytes += part.length()
      } finally reader.close()
    }
    (rows, bytes)
  }

  // Footer metadata is immutable for a given snapshot directory; memoize
  // per-dir so repeated catalog queries in one session skip re-reading
  // footers (the reference's S10 in-memory cache analog for metadata).
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[TableMeta]]()

  /** S4: all table schemas as a catalog Dataset. VIEW/EXTERNAL tables (per
    * the `_tabletypes.json` sidecar) are excluded unless requested —
    * reference include_views/include_external semantics
    * (bigquery_connector.py:222-233, both default false).
    */
  def catalog(
      spark: SparkSession,
      dir: String,
      maxResults: Int = 1000,
      includeViews: Boolean = false,
      includeExternal: Boolean = false): Dataset[TableMeta] = {
    import spark.implicits._
    val metas = metaCache.computeIfAbsent(
      s"$dir#$maxResults",
      _ => {
        val types = tableTypes(dir) // one sidecar parse for the whole catalog
        listTables(dir, maxResults).map(tableMeta(spark, dir, _, types))
      })
    val kept = metas.filter(t =>
      t.tableType match {
        case "VIEW" => includeViews
        case "EXTERNAL" => includeExternal
        case _ => true
      })
    spark.createDataset(kept)
  }

  /** Materialize a small metadata frame into a LocalRelation: catalog-scale
    * results (classified columns, detected edges) are a few hundred rows, so
    * pinning them local removes re-execution of their derivation from every
    * downstream plan that references them more than once.
    */
  def localized(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(df.collect().toSeq.asJava, df.schema)
  }

  /** Explode the catalog into one row per (table, column) — the input shape
    * for key classification and relationship detection (SURVEY §2.2 P1).
    */
  def columnRefs(catalog: Dataset[TableMeta]): Dataset[ColumnRef] = {
    val spark = catalog.sparkSession
    import spark.implicits._
    // The catalog is driver-resident metadata (a LocalRelation over memoized
    // footer reads) — explode it driver-side into a new LocalRelation rather
    // than a typed flatMap, so downstream plans see a plain local scan
    // instead of 12 repeated Deserialize→MapPartitions→Serialize pipelines
    // (the detect pipeline references this frame from every strategy).
    val refs = catalog.collect().toSeq.flatMap { t =>
      t.columns.map(c =>
        ColumnRef(t.tableName, c.name, c.dataType, c.nullable, c.isArray, c.ordinal, t.numRows))
    }
    spark.createDataset(refs)
  }
}
