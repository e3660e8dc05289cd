package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency discovery — the directed complement of
  * [[CompositeKeys]]: instead of asking "is (a, b) unique?", ask "does a
  * determine b?" (every value of `a` maps to exactly one value of `b`).
  * This is the profiling primitive behind normalization advice, derived-
  * column detection, and denormalized-dimension discovery — the natural
  * next step after the reference's single-column key heuristics
  * (gcp-datalake-utils schema_analyzer's uniqueness probes); the FD form
  * is original.
  *
  * `a → b` holds exactly when `COUNT(DISTINCT a) == COUNT(DISTINCT (a, b))`
  * — each determinant value pairs with one dependent value. Both counts run
  * over STRUCT values so a NULL field is itself a countable value (Spark
  * structs and DuckDB ROWs agree; bare `COUNT(DISTINCT a)` would skip
  * nulls in both engines but multi-column distinct semantics diverge —
  * the q123 lesson).
  *
  * Cost model matches [[CompositeKeys]]: ONE aggregate pass; every
  * `COUNT(DISTINCT …)` adds an Expand duplication of the scan rows
  * (k columns + p pairs ⇒ ×(k+p) rows into the partial aggregate, each
  * carrying only the struct payload). Candidates should come from the
  * classifier's interesting columns — the cap is explicit. At cluster
  * scale this is a single shuffle of (group-struct) keys with map-side
  * partial distinct — no per-pair rescans.
  */
object FunctionalDeps {

  /** Test every DIRECTED pair of `candidates` for the functional dependency
    * determinant → dependent. Output one row per direction:
    * (table_name, determinant, dependent, n_rows, n_det, n_pair, holds)
    * where `n_det` is the distinct determinant count, `n_pair` the distinct
    * (determinant, dependent) count, and `holds` ⇔ n_det == n_pair.
    */
  def discover(
      df: DataFrame, tableName: String, candidates: Seq[String],
      maxPairs: Int = 15): DataFrame = {
    require(candidates.size >= 2, "need at least two candidate columns")
    val pairs = candidates.combinations(2).toSeq.take(maxPairs)
    // one independent two-phase aggregate per distinct count (see
    // CompositeKeys — the k-way Expand form duplicates every scan row
    // through one wide aggregate; the split branches are column-pruned,
    // map-side-combined, and scheduled in parallel), crossJoined back into
    // the same single wide row
    val colAggs = candidates.map(c =>
      df.agg(countDistinct(struct(col(c))).as(s"__d_$c")))
    val pairAggs = pairs.map { case Seq(a, b) =>
      df.agg(countDistinct(struct(col(a), col(b))).as(s"__d_${a}__$b"))
    }
    val aggs = (colAggs ++ pairAggs) :+ df.agg(count(lit(1)).as("__n"))
    val directed = pairs.flatMap { case Seq(a, b) => Seq((a, b), (b, a)) }
    aggs.reduce(_ crossJoin _)
      .select(explode(array(directed.map { case (det, dep) =>
        // the pair agg is keyed by the UNORDERED pair's candidate order
        val (pa, pb) = if (candidates.indexOf(det) < candidates.indexOf(dep))
          (det, dep) else (dep, det)
        struct(
          lit(tableName).as("table_name"),
          lit(det).as("determinant"), lit(dep).as("dependent"),
          col("__n").as("n_rows"),
          col(s"__d_$det").as("n_det"),
          col(s"__d_${pa}__$pb").as("n_pair"),
          (col(s"__d_$det") === col(s"__d_${pa}__$pb")).as("holds"))
      }: _*)).as("p"))
      .select("p.*")
  }

  /** Approximate functional dependencies (E171): for each DIRECTED pair,
    * the exact VIOLATION count — the minimum number of rows whose
    * dependent value must change for `det → dep` to hold (g₃ error,
    * Kivinen–Mannila): with per-(det, dep) cell counts n, violations =
    * n_rows − Σ_det max_dep(n). [[discover]] answers yes/no; this ranks
    * the near-misses — "o_custkey determines o_orderpriority for 99.2% of
    * rows" is a data-quality finding a boolean FD scan throws away.
    *
    * Scale: one (det, dep) hash aggregation + one det-keyed max per pair
    * (both map-side combined, keyed by data values — no parallelism cap);
    * pairs are an explicit candidate list, not a combinatorial sweep.
    */
  def approxDeps(
      df: DataFrame, tableName: String,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one directed pair")
    pairs.map { case (det, dep) =>
      val cells = df.groupBy(col(det).as("a"), col(dep).as("b"))
        .agg(count(lit(1)).as("n"))
      val perDet = cells.groupBy("a")
        .agg(sum(col("n")).as("tot"), max(col("n")).as("mx"))
      perDet.agg(
        sum(col("tot")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_det"),
        (sum(col("tot")) - sum(col("mx"))).cast("long").as("violations"))
        .select(
          lit(tableName).as("table_name"),
          lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_rows"), col("n_det"), col("violations"),
          (col("violations") === 0L).as("holds"),
          graft.ext.ExactMath.floorDiv(col("violations") * lit(1048576L),
            col("n_rows")).as("violation_fp"))
    }.reduce(_ unionByName _)
  }
}
