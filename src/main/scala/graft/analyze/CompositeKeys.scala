package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composite-key discovery — the extension of KeyClassifier's single-column
  * PK analysis (SURVEY P1-P4) to column PAIRS, for tables where no single
  * column is unique (a fact table's natural key is usually (parent id,
  * line number)). Reference analogue: the single-column uniqueness probe in
  * schema analysis (gcp-datalake-utils schema_analyzer's key heuristics);
  * the pairwise form is original.
  *
  * All candidate pairs are tested in ONE aggregate pass: each
  * `COUNT(DISTINCT pair)` costs an Expand-operator duplication of the scan
  * rows (k pairs ⇒ ×k rows into the aggregate), which is why `candidates`
  * should come from the classifier's likely-key columns, not every column
  * — the cap is explicit. Pairs are counted as STRUCT values, not
  * concatenated strings: structs carry the raw (typically fixed-width)
  * values through the distinct aggregate, and a struct with a NULL field
  * is itself non-null, so Spark and DuckDB agree that (1, NULL) is one
  * distinct pair — multi-argument `COUNT(DISTINCT a, b)` would NOT agree
  * (Spark skips null-containing rows).
  */
object CompositeKeys {

  def compositeKeys(
      df: DataFrame, tableName: String, candidates: Seq[String],
      maxPairs: Int = 15): DataFrame = {
    require(candidates.size >= 2, "need at least two candidate columns")
    val pairs = candidates.combinations(2).toSeq.take(maxPairs)
    def keyExpr(a: String, b: String) = struct(col(a), col(b))
    // One independent two-phase aggregate per pair, crossJoined, instead of
    // k distinct aggregates in one agg call: multiple COUNT(DISTINCT …)
    // compile to an Expand that duplicates every scan row k+1 times through
    // a single wide hash aggregate (measured 17 CPU-s on lineitem at
    // sf0.1), while k separate branches are narrow column-pruned passes
    // that partial-aggregate map-side and run as independent stages in
    // parallel. Same counts, same single-row wide shape.
    val aggs = pairs.map { case Seq(a, b) =>
      df.agg(countDistinct(keyExpr(a, b)).as(s"__d_${a}__$b"))
    } :+ df.agg(count(lit(1)).as("__n"))
    aggs.reduce(_ crossJoin _)
      .select(explode(array(pairs.map { case Seq(a, b) =>
        struct(
          lit(tableName).as("table_name"),
          lit(a).as("col_a"), lit(b).as("col_b"),
          col("__n").as("n_rows"),
          col(s"__d_${a}__$b").as("n_distinct"),
          (col(s"__d_${a}__$b") === col("__n")).as("is_key"))
      }: _*)).as("p"))
      .select("p.*")
  }
}
