package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.catalog.ParquetCatalog

/** Column profiling — the data-quality companion to DataTester (SURVEY
  * §2.6's sampling/metrics family): per-column counts, null/distinct
  * cardinality, range, and mean in ONE scan, plus equi-width histograms.
  *
  * Scale design: `numericProfile` computes every column's aggregates in a
  * single wide aggregation — one pass over 100 TB, map-side combined — and
  * unpivots the resulting single row driver-side (k × 6 values). The
  * distinct counts are exact (Spark expands multi-distinct into one
  * shuffle); swap to approx_count_distinct at scale via the
  * ApproxDistinctRewrite rule if the exact shuffle dominates. Sums
  * accumulate in DECIMAL(18,4), so means are order-independent and
  * engine-portable (the q01 discipline).
  */
object Profiler {

  /** The one-pass k×6 wide aggregate both profile routes share —
    * `approxRsd = None` takes the exact multi-distinct (Expand shuffle),
    * `Some(rsd)` the HLL++ sketch. Package-private so plan tests can pin
    * each route's physical shape: the public profiles localize this single
    * row (hiding the aggregate from their own explain output).
    */
  private[graft] def profileWideAgg(
      df: DataFrame, columns: Seq[String], approxRsd: Option[Double]): DataFrame = {
    def regularAggs(c: String) = Seq(
      count(col(c)).as(s"${c}__n"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max"),
      sum(col(c).cast(DecimalType(18, 4))).cast("double").as(s"${c}__sum"))
    approxRsd match {
      case Some(r) =>
        // HLL sketches are plain partial aggregates — everything stays ONE
        // combine-friendly pass
        val aggs = columns.flatMap(c =>
          regularAggs(c) :+ approx_count_distinct(col(c), r).as(s"${c}__distinct"))
        df.agg(aggs.head, aggs.tail: _*)
      case None =>
        // k exact COUNT(DISTINCT) in one agg would compile to an Expand
        // duplicating every scan row k+1 times through one wide hash
        // aggregate; split each into its own narrow column-pruned
        // two-phase branch (independent stages, map-side partials) and
        // crossJoin the single-row results back into the same wide row
        val regular = columns.flatMap(regularAggs)
        val base = df.agg(regular.head, regular.tail: _*)
        columns.foldLeft(base) { (acc, c) =>
          acc.crossJoin(df.agg(countDistinct(col(c)).as(s"${c}__distinct")))
        }
    }
  }

  /** Unpivot the pinned wide row into one output row per column. */
  private def unpivotProfile(wide: DataFrame, columns: Seq[String]): DataFrame =
    columns.map { c =>
      wide.select(
        lit(c).as("column_name"),
        col(s"${c}__n").as("n"),
        coalesce(col(s"${c}__nulls"), lit(0L)).as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        (col(s"${c}__sum") / col(s"${c}__n")).as("mean_v"))
    }.reduce(_ unionByName _)

  def numericProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "numericProfile needs at least one column")
    // one row of k×6 aggregates, pinned so the per-column unpivot reads it
    // instead of re-running the scan k times
    unpivotProfile(
      ParquetCatalog.localized(profileWideAgg(df, columns, None)), columns)
  }

  /** Approx twin of [[numericProfile]]: identical output schema, but the
    * distinct counts come from HLL++ (`approx_count_distinct`, default rsd
    * 2.3%) — a mergeable map-side sketch with NO Expand stage, so the
    * profile stays one combine-friendly pass at any corpus size. Every
    * other field (counts, nulls, min/max, decimal-exact mean) is identical
    * to the exact path; only n_distinct becomes an estimate.
    */
  def approxNumericProfile(
      df: DataFrame, columns: Seq[String], rsd: Double = 0.023): DataFrame = {
    require(columns.nonEmpty, "approxNumericProfile needs at least one column")
    unpivotProfile(
      ParquetCatalog.localized(profileWideAgg(df, columns, Some(rsd))), columns)
  }

  /** Cost-routed profile: the catalog's FOOTER row count (a driver-side
    * metadata read — no data pages, no extra job) picks [[numericProfile]]'s
    * exact multi-distinct below `exactRowLimit` and
    * [[approxNumericProfile]]'s sketch path above it — the
    * ApproxDistinctRewrite threshold idea applied at the operator surface,
    * so a 100 TB caller is routed off the Expand shuffle automatically
    * instead of having to know the escape hatch exists.
    */
  def profileAuto(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      table: String,
      columns: Seq[String],
      exactRowLimit: Long = 50000000L): DataFrame = {
    val meta = ParquetCatalog.tableMeta(spark, dir, table)
    val df = spark.read.parquet(meta.path)
    if (meta.numRows <= exactRowLimit) numericProfile(df, columns)
    else approxNumericProfile(df, columns)
  }

  /** Exact continuous percentiles (index = p·(n−1), linear interpolation —
    * the SQL-standard PERCENTILE_CONT definition DuckDB's quantile_cont
    * shares), one output row per requested p. Exact percentile aggregation
    * buffers each partition's values — right for profiling runs and the
    * oracle; at full 100 TB interactive scale use [[approxPercentiles]]
    * (mergeable sketch, map-side combined) — [[percentilesAuto]] routes
    * between the two automatically off the footer row count.
    */
  /** The one-pass array-percentile aggregate both quantile routes share —
    * `approxAccuracy = None` takes the exact sorted value buffer,
    * `Some(accuracy)` the mergeable `approx_percentile` sketch.
    * Package-private so plan tests can pin each route's physical shape
    * (the public surfaces localize the single wide row, hiding the
    * aggregate from their own explain output).
    */
  private[graft] def percentileWideAgg(
      df: DataFrame, column: String, ps: Seq[Double],
      approxAccuracy: Option[Int]): DataFrame =
    df.agg(approxAccuracy
      .map(a => percentile_approx(col(column), typedlit(ps), lit(a)))
      .getOrElse(percentile(col(column), typedlit(ps)))
      .as("__ps"))

  private def unpivotPercentiles(
      wide: DataFrame, ps: Seq[Double]): DataFrame =
    ps.zipWithIndex.map { case (p, i) =>
      wide.select(lit(p).as("p"),
        element_at(col("__ps"), i + 1).cast("double").as("value"))
    }.reduce(_ unionByName _)

  def percentiles(df: DataFrame, column: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "percentiles needs at least one p")
    // ONE array-percentile aggregate: a single value buffer + single sort
    // serves every requested p (N separate aggregates would buffer and
    // sort the column N times — measured 3× slower at five ps)
    unpivotPercentiles(
      ParquetCatalog.localized(percentileWideAgg(df, column, ps, None)), ps)
  }

  /** Approx twin of [[percentiles]]: identical (p, value) output schema,
    * but the quantiles come from `approx_percentile` (a mergeable
    * quantile sketch, map-side combined) — NO per-partition value
    * buffering, so the pass stays one combine-friendly aggregation at any
    * corpus size. `accuracy` trades sketch size for error (1/accuracy
    * relative rank error).
    */
  def approxPercentiles(
      df: DataFrame, column: String, ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty, "approxPercentiles needs at least one p")
    unpivotPercentiles(
      ParquetCatalog.localized(
        percentileWideAgg(df, column, ps, Some(accuracy))), ps)
  }

  /** Cost-routed percentiles, the [[profileAuto]] discipline applied to
    * quantiles: the catalog's FOOTER row count (driver-side metadata read,
    * no data pages) picks [[percentiles]]' exact sorted-buffer aggregate
    * below `exactRowLimit` and [[approxPercentiles]]' mergeable sketch
    * above it — a 100 TB caller is routed off the per-partition value
    * buffer automatically instead of having to know the escape hatch
    * exists.
    */
  def percentilesAuto(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      table: String,
      column: String,
      ps: Seq[Double],
      exactRowLimit: Long = 50000000L,
      accuracy: Int = 10000): DataFrame = {
    val meta = ParquetCatalog.tableMeta(spark, dir, table)
    val df = spark.read.parquet(meta.path)
    if (meta.numRows <= exactRowLimit) percentiles(df, column, ps)
    else approxPercentiles(df, column, ps, accuracy)
  }

  /** Equi-width histogram over `[lo, hi)` in `nBuckets` buckets; values at
    * or above `hi` clamp into the last bucket, below `lo` into the first.
    * One aggregation keyed by the (small-int) bucket id — a single
    * map-side-combined pass at any scale. Bucket arithmetic is plain
    * IEEE floor/divide, identical in any engine.
    */
  def histogram(
      df: DataFrame, column: String,
      lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "histogram needs hi > lo and nBuckets > 0")
    val width = (hi - lo) / nBuckets
    val x = col(column).cast("double")
    val bucket = least(
      greatest(floor((x - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("int")
    df.filter(x.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(x.cast(DecimalType(18, 4))).cast("double").as("sum_v"))
      .withColumn("lo_v", lit(lo) + col("bucket").cast("double") * lit(width))
      .withColumn("hi_v", lit(lo) + (col("bucket") + 1).cast("double") * lit(width))
      .select("bucket", "lo_v", "hi_v", "n", "sum_v")
  }

  /** Merge equi-width histogram states built with the same (lo, hi,
    * nBuckets) — bin-wise sums, so [[histogram]] doubles as a MERGEABLE
    * quantile sketch: shards histogram independently, merge, then read
    * quantiles off the merged state with [[quantileEstimate]].
    */
  def histogramMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("bucket", "lo_v", "hi_v")
      .agg(
        coalesce(sum(col("n")), lit(0L)).cast("long").as("n"),
        sum(col("sum_v")).cast("double").as("sum_v"))

  /** p-quantile estimates from a histogram state: find the bin holding the
    * ⌈p·n⌉-th value via a cumulative sum over the (nBuckets-row) bin
    * table, then interpolate uniformly within the bin. Error is bounded by
    * one bin width — the deterministic, mergeable scale path where
    * [[percentiles]]' exact value buffer can't run and approx_percentile's
    * t-digest isn't reproducible across engines. All arithmetic is
    * integer ranks + single-op IEEE doubles (engine-portable).
    */
  def quantileEstimate(sketch: DataFrame, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      "quantileEstimate needs ps in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    // global window + crossJoin are sketch-scale (nBuckets rows) by design
    val cum = sketch
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_before", col("cum") - col("n"))
      .crossJoin(broadcast(sketch.agg(sum(col("n")).as("total"))))
    cum
      .select(explode(typedlit(ps)).as("p"), col("*"))
      .withColumn("rnk", ceil(col("p") * col("total").cast("double")))
      .where(col("cum") >= col("rnk") && col("cum_before") < col("rnk"))
      .select(col("p"), col("bucket"), col("rnk"),
        (col("lo_v") +
          ((col("rnk") - col("cum_before")).cast("double") / col("n").cast("double")) *
            (col("hi_v") - col("lo_v"))).as("est"))
  }

  /** Per-group equi-width histogram state: [[histogram]]'s bins computed
    * for every group in ONE pass (group key joins the groupBy key). The
    * state is mergeable per group with [[histogramMerge]]'s discipline
    * (union + bin-wise sums including the group column), and
    * [[quantileEstimateBy]] reads per-group quantiles off it — the scale
    * path for "p50/p99 length per language" over a corpus too large for
    * per-group exact percentile buffers.
    */
  def histogramBy(
      df: DataFrame, groupCol: String, column: String,
      lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "histogram needs hi > lo and nBuckets > 0")
    val width = (hi - lo) / nBuckets
    val x = col(column).cast("double")
    val bucket = least(
      greatest(floor((x - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("int")
    df.filter(x.isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol), bucket.as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(x.cast(DecimalType(18, 4))).cast("double").as("sum_v"))
      .withColumn("lo_v", lit(lo) + col("bucket").cast("double") * lit(width))
      .withColumn("hi_v", lit(lo) + (col("bucket") + 1).cast("double") * lit(width))
      .select(col(groupCol), col("bucket"), col("lo_v"), col("hi_v"), col("n"), col("sum_v"))
  }

  /** Per-group p-quantile estimates from a [[histogramBy]] state: the
    * cumulative walk and in-bin interpolation of [[quantileEstimate]], run
    * per group via partitioned windows. Sketch-scale by construction
    * (groups × nBuckets rows) — the data itself is never touched again.
    */
  def quantileEstimateBy(
      sketch: DataFrame, groupCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      "quantileEstimateBy needs ps in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(groupCol)
    val cum = sketch
      .withColumn("cum", sum(col("n")).over(
        byGroup.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_before", col("cum") - col("n"))
      .withColumn("total", sum(col("n")).over(byGroup))
    cum
      .select(explode(typedlit(ps)).as("p"), col("*"))
      .withColumn("rnk", ceil(col("p") * col("total").cast("double")))
      .where(col("cum") >= col("rnk") && col("cum_before") < col("rnk"))
      .select(col(groupCol), col("p"), col("bucket"), col("rnk"),
        (col("lo_v") +
          ((col("rnk") - col("cum_before")).cast("double") / col("n").cast("double")) *
            (col("hi_v") - col("lo_v"))).as("est"))
  }

  /** Key-skew profile: per-key row counts summarized as key count, max-key
    * fanout, top-key share, and the EXACT Gini coefficient of the key
    * distribution — the preflight that decides whether a join needs
    * salting ([[graft.ops.SkewJoin]]) before it runs.
    *
    * Gini without a global rank over keys: ranks enter the classic
    * Σ(2i−n−1)·xᵢ numerator only through tie-runs of equal counts, so the
    * sum collapses to Σ_v v·m_v·(2s_v + m_v − n) over the
    * COUNTS-OF-COUNTS table (value v, multiplicity m, cumulative
    * multiplicity-before s) — integer-exact, and the only ordered window
    * runs over distinct frequency VALUES (a table bounded by the distinct
    * integers that appear as key counts — thousands at most in practice,
    * never data-scale). The one key-scale operation is the groupBy(key)
    * count, which any skew diagnosis must pay.
    */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("x"))
    val byVal = counts.groupBy(col("x")).agg(count(lit(1)).as("m"))
    val withS = byVal.withColumn("s",
      coalesce(sum(col("m")).over(
        Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val totals = byVal.agg(
      sum(col("m")).cast("long").as("n_keys"),
      sum(col("x") * col("m")).cast("long").as("n_rows"),
      max(col("x")).cast("long").as("max_key_rows"))
    withS.crossJoin(broadcast(totals))
      .agg(
        max(col("n_keys")).as("n_keys"),
        max(col("n_rows")).as("n_rows"),
        max(col("max_key_rows")).as("max_key_rows"),
        sum(col("x").cast("decimal(38,0)") * col("m") *
          (col("s") * 2 + col("m") - col("n_keys"))).as("__gnum"))
      .select(
        col("n_keys"), col("n_rows"), col("max_key_rows"),
        (col("max_key_rows").cast("double") / col("n_rows").cast("double"))
          .as("top_share"),
        (col("__gnum").cast("double") /
          (col("n_keys").cast("double") * col("n_rows").cast("double"))).as("gini"))
  }

  /** Robust (median/IQR) scaling of a numeric column — the normalization a
    * curation pipeline applies to quality scores before mixing corpora
    * whose scorers have different ranges (robust_z = (x − median)/IQR;
    * outlier-insensitive where mean/stddev scaling is not). A constant
    * column (IQR 0) scales to 0 everywhere rather than dividing by zero.
    *
    * Scale: one exact-percentile aggregate produces the three quantiles
    * (see [[percentiles]] for the exact-vs-approx trade at full scale),
    * broadcast back as a single row; the scaling itself is map-side.
    */
  def robustScale(
      df: DataFrame, column: String, idCol: String): DataFrame = {
    val stats = ParquetCatalog.localized(
      df.agg(percentile(col(column), typedlit(Seq(0.25, 0.5, 0.75))).as("__q")))
      .select(
        element_at(col("__q"), 1).as("p25"),
        element_at(col("__q"), 2).as("med"),
        element_at(col("__q"), 3).as("p75"))
    df.select(col(idCol), col(column))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col(column),
        when(col("p75") === col("p25"), lit(0.0))
          .otherwise(
            round((col(column).cast("double") - col("med")) /
              (col("p75") - col("p25")), 6))
          .as("robust_z"))
  }

  /** Per-group [[robustScale]]: median/IQR z-scores where the statistics
    * are computed WITHIN each group — the right normalization when groups
    * have different natural scales (per-source document lengths, per-
    * language quality scores): a global median would mark every document
    * of a long-form source as an outlier.
    *
    * Scale: one exact-percentile aggregate per group (|groups| rows,
    * broadcast back) + a map-side join; the corpus is scanned once.
    */
  def robustScaleBy(
      df: DataFrame, column: String, idCol: String, groupCol: String): DataFrame = {
    val stats = df.groupBy(col(groupCol))
      .agg(percentile(col(column), typedlit(Seq(0.25, 0.5, 0.75))).as("__q"))
      .select(col(groupCol),
        element_at(col("__q"), 1).as("p25"),
        element_at(col("__q"), 2).as("med"),
        element_at(col("__q"), 3).as("p75"))
    df.select(col(idCol), col(groupCol), col(column))
      .join(broadcast(stats), Seq(groupCol))
      .select(col(idCol), col(groupCol), col(column),
        when(col("p75") === col("p25"), lit(0.0))
          .otherwise(
            round((col(column).cast("double") - col("med")) /
              (col("p75") - col("p25")), 6))
          .as("robust_z"))
  }

  /** Exact join-cardinality preflight: the size an equi-join WOULD produce,
    * computed from per-key counts without running the join —
    * Σ_common-keys n_left(k)·n_right(k) — plus the worst single-key fanout
    * (the skew headline). The planning probe to run before committing a
    * 100 TB × 100 TB join: counts-level rows (one per distinct key) are
    * all that shuffles, and a hot key shows up as `max_key_rows` instead
    * of as a dead executor.
    */
  def joinCardinality(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val l = left.groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("nl"))
    val r = right.groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("nr"))
    l.join(r, Seq("key"), "full_outer")
      .agg(
        sum(col("nl")).cast("long").as("n_left"),
        sum(col("nr")).cast("long").as("n_right"),
        count(col("nl")).as("n_keys_left"),
        count(col("nr")).as("n_keys_right"),
        sum(when(col("nl").isNotNull && col("nr").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_common_keys"),
        coalesce(
          sum(col("nl").cast("decimal(38,0)") * col("nr").cast("decimal(38,0)")),
          lit(0L)).cast("long").as("join_rows"),
        coalesce(
          max(col("nl").cast("decimal(38,0)") * col("nr").cast("decimal(38,0)")),
          lit(0L)).cast("long").as("max_key_rows"))
  }

  /** Exact global RANK() without a global sort of the rows.
    *
    * rank(x) = 1 + (rows with a strictly smaller value), which needs only
    * per-VALUE counts: aggregate to the distinct-value table (map-side
    * combined), cumulate it with ONE small window, and join the rank map
    * back by value. The window therefore sorts |distinct values| rows, not
    * |rows| — for fixed-point signals (floor(score·10⁶), integer counts)
    * that is bounded by the grid size no matter how large the corpus, where
    * `Window.orderBy(value)` over the raw rows would single-task the whole
    * table. Ties share a rank, exactly like SQL RANK() — bit-identical to
    * the window formulation (ProfilerSpec) and to a DuckDB oracle (q135).
    *
    * Quantize continuous scores before calling (the value-count table is
    * only small if values repeat); the join back is value-keyed, so AQE
    * broadcasts the rank map.
    */
  def exactRank(df: DataFrame, valueCol: String, rankCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(valueCol).as("__v")).agg(count(lit(1)).as("__n"))
    val w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    val ranks = counts
      .withColumn(rankCol, coalesce(sum(col("__n")).over(w), lit(0L)) + 1L)
      .drop("__n")
    df.join(ranks, df(valueCol) === ranks("__v")).drop("__v")
  }

  /** Rank-fusion score: each signal becomes its exact global rank
    * (ascending — higher signal, higher rank) and rows are scored by the
    * integer rank sum. Rank fusion is the robust way to combine signals on
    * incomparable scales (quality ∈ [0,1], margins in counts, lengths in
    * tokens): no normalization constants, no float weighting, outliers
    * can't dominate. All-integer output.
    */
  def rankFusion(df: DataFrame, signalCols: Seq[String]): DataFrame = {
    require(signalCols.nonEmpty, "need at least one signal")
    // Truncate lineage once: each signal's count aggregation and rank join
    // would otherwise re-evaluate the (often expensive) upstream scoring
    // plan per signal — 2·k scans of the text expressions for k signals.
    // The checkpointed table is the slim signal projection only.
    val base = df.localCheckpoint()
    val ranked = signalCols.foldLeft(base)((d, c) => exactRank(d, c, s"rank_$c"))
    ranked.withColumn(
      "fused_rank_sum",
      signalCols.map(c => col(s"rank_$c")).reduce(_ + _))
  }

  /** Trimmed mean per group: drop the lowest and highest
    * ⌊n·trimNum/trimDen⌋ rows by (value, id) rank, then average the rest —
    * the outlier-robust location estimate for per-source length/score
    * monitoring (a handful of giant documents can't move it). All-integer:
    * the mean is reported as a 2²⁰ fixed-point floor quotient of exact
    * sums. Groups too small to trim (n − 2k < 1) fall back to untrimmed.
    *
    * Scale: one per-group rank window + one aggregation; nothing global.
    */
  def trimmedMeanBy(
      df: DataFrame, valueCol: String, idCol: String, groupCol: String,
      trimNum: Int = 1, trimDen: Int = 10): DataFrame = {
    val g = col(groupCol)
    val ranked = df.select(g, col(idCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(g).orderBy(col(valueCol).asc, col(idCol).asc)))
      .withColumn("__ng", count(lit(1)).over(Window.partitionBy(g)))
    val rawK = graft.ext.ExactMath.floorDiv(col("__ng") * trimNum, lit(trimDen))
    val k = when(col("__ng") - rawK * 2 < 1L, 0L).otherwise(rawK)
    ranked
      .withColumn("__k", k)
      .filter(col("__rn") > col("__k") && col("__rn") <= col("__ng") - col("__k"))
      .groupBy(g)
      .agg(
        max(col("__ng")).cast("long").as("n"),
        max(col("__k")).cast("long").as("k_trim"),
        count(lit(1)).as("n_used"),
        sum(col(valueCol).cast("decimal(38,0)")).as("__sum"))
      .select(g, col("n"), col("k_trim"), col("n_used"),
        col("__sum").cast("long").as("sum_kept"),
        graft.ext.ExactMath.floorDiv(col("__sum") * lit(1048576L), col("n_used"))
          .as("mean_fp"))
  }

  /** Winsorization per group: values are CLAMPED to the group's
    * [p05, p95] band (robustScaleBy's sibling — instead of flagging or
    * rescaling outliers it caps them), with flags for which side was
    * clipped. The standard pre-aggregation step when a mean must be
    * reported but a handful of extreme rows would own it.
    *
    * Scale: one exact-percentile aggregate per group, broadcast back;
    * the clamp itself is map-side. Quantile interpolation is the same
    * `percentile` linear rule DuckDB's quantile_cont uses, so the band
    * edges agree across engines (cf. robustScaleBy / q158).
    */
  def winsorizeBy(
      df: DataFrame, column: String, idCol: String, groupCol: String): DataFrame = {
    val g = col(groupCol)
    val stats = df.groupBy(g)
      .agg(percentile(col(column), typedlit(Seq(0.05, 0.95))).as("__q"))
      .select(g, element_at(col("__q"), 1).as("p05"),
        element_at(col("__q"), 2).as("p95"))
    df.select(col(idCol), g, col(column))
      .join(broadcast(stats), Seq(groupCol))
      .select(col(idCol), g, col(column),
        round(greatest(least(col(column).cast("double"), col("p95")), col("p05")), 6)
          .as("winsorized"),
        (col(column).cast("double") < col("p05")).as("clipped_lo"),
        (col(column).cast("double") > col("p95")).as("clipped_hi"))
  }

  /** Per-group simple linear regression (OLS y on x) as exact integers:
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), reported with the
    * intercept as 2²⁰ fixed-point floor quotients computed entirely in
    * DECIMAL(38,0) — both engines agree bit-for-bit. A zero-variance x
    * (den = 0) reports 0 for both. The calibration primitive behind
    * "chars per token" style conversion factors and drift-over-covariate
    * checks, per source.
    *
    * Scale: one map-side-combined aggregation to 5 sums per group.
    * Intermediates are bounded by ~n·max(x)·max(y)·2²⁰ — inside decimal38
    * for corpus-scale counts with 10⁶-scale values.
    */
  def olsBy(df: DataFrame, x: Column, y: Column, groupCol: String): DataFrame = {
    val g = col(groupCol)
    val base = df.select(g,
        x.cast("decimal(20,0)").as("__x"), y.cast("decimal(20,0)").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val a = base.groupBy(g).agg(
      count(lit(1)).cast("decimal(20,0)").as("__n"),
      sum(col("__x")).as("__sx"),
      sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__x") * col("__y")).as("__sxy"))
    val num = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    a.select(g,
      col("__n").cast("long").as("n"),
      col("__sx").cast("long").as("sum_x"),
      col("__sy").cast("long").as("sum_y"),
      when(den === 0, 0L)
        .otherwise(graft.ext.ExactMath.floorDiv(num * lit(1048576L), den))
        .cast("long").as("slope_fp"),
      when(den === 0, 0L)
        .otherwise(graft.ext.ExactMath.floorDiv(
          (col("__sy") * den - num * col("__sx")) * lit(1048576L),
          col("__n") * den))
        .cast("long").as("intercept_fp"))
  }

  /** Quantile normalization: every row's value is replaced by the GLOBAL
    * value at the same within-group quantile position — the standard way
    * to force per-source distributions onto one reference shape before
    * mixing feeds (per-source length/score scales stop mattering; ranks
    * do). Exact and integer-only: the r-th of n_g rows in a group (ties
    * broken by `idCol`) maps to global sort position
    * ⌈r·N / n_g⌉ ∈ [1, N], and the output value is the global order
    * statistic at that position.
    *
    * Scale: the per-group rank is a per-group window (sorts one group per
    * task); the global order statistics are NOT materialized per row —
    * positions are resolved against the cumulative counts of the DISTINCT
    * values (|distinct values| rows, broadcast), via a range join on the
    * contiguous position intervals each value covers. The corpus never
    * sorts globally.
    */
  def quantileNormalize(
      df: DataFrame, valueCol: String, idCol: String, groupCol: String): DataFrame = {
    val base = df.select(col(idCol), col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
    val totals = base.agg(count(lit(1)).cast("long").as("n_total"))
    val groupN = base.groupBy(col(groupCol)).agg(count(lit(1)).as("n_grp"))
    val ranked = base
      .withColumn("__r", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col(valueCol).asc, col(idCol).asc)))
      .join(broadcast(groupN), Seq(groupCol))
      .crossJoin(broadcast(totals))
      // ⌈r·N / n_g⌉ through decimals: r·N overflows a long at full scale.
      .withColumn("qpos", graft.ext.ExactMath.floorDiv(
        col("__r").cast("decimal(38,0)") * col("n_total") + col("n_grp") - 1L,
        col("n_grp")))
    // Distinct-value cumulative counts: value v covers global positions
    // (cum − n_v, cum]. The window runs over distinct values only.
    val cum = base.groupBy(col(valueCol).as("__v")).agg(count(lit(1)).as("__nv"))
      .withColumn("__cum", sum(col("__nv")).over(
        Window.orderBy(col("__v").asc).rowsBetween(Window.unboundedPreceding, 0)))
    ranked.join(broadcast(cum),
        col("qpos") > col("__cum") - col("__nv") && col("qpos") <= col("__cum"))
      .select(col(idCol), col(groupCol), col(valueCol),
        col("qpos").cast("long").as("qpos"), col("__v").as("norm_value"))
  }

  /** One-pass Pearson correlation matrix (E173): every pair of the given
    * numeric columns, from ONE aggregation over ONE scan. Values quantize
    * to 10⁻⁴ fixed point (⌊x·10⁴+0.5⌋ — the cross-engine rounding
    * discipline), all moments are exact DECIMAL(38) integers, and only the
    * final r = num/(√denx·√deny) runs in doubles (same expression tree in
    * both engines, floored into 2²⁰ fixed point). Degenerate columns
    * (zero variance) report r_fp = 0.
    *
    * Scale: one map-side-combined aggregate carrying k + k(k−1)/2 moment
    * columns; no shuffle beyond the single 1-row reduce. DECIMAL(38)
    * bounds the audit at ~10¹² rows for 10⁹-scale quantized values —
    * shard beyond that.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val dec = "decimal(38,0)"
    def qcol(c: String) = floor(col(c).cast("double") * 10000.0 + 0.5).cast(dec)
    val base = df.select(cols.map(c => qcol(c).as(c)): _*)
    val pairs = cols.combinations(2).toSeq
    val singles = cols.flatMap(c => Seq(
      sum(col(c)).as(s"__s_$c"), sum(col(c) * col(c)).as(s"__ss_$c")))
    val crosses = pairs.map { case Seq(a, b) =>
      sum(col(a) * col(b)).as(s"__sp_${a}__$b")
    }
    val agg = base.agg(
      (singles ++ crosses :+ count(lit(1)).cast(dec).as("__n")).head,
      (singles ++ crosses :+ count(lit(1)).cast(dec).as("__n")).tail: _*)
    agg.select(explode(array(pairs.map { case Seq(a, b) =>
      val n = col("__n")
      val num = n * col(s"__sp_${a}__$b") - col(s"__s_$a") * col(s"__s_$b")
      val dx = n * col(s"__ss_$a") - col(s"__s_$a") * col(s"__s_$a")
      val dy = n * col(s"__ss_$b") - col(s"__s_$b") * col(s"__s_$b")
      val r = num.cast("double") /
        (sqrt(dx.cast("double")) * sqrt(dy.cast("double")))
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        n.cast("long").as("n"),
        when(dx > 0 && dy > 0, floor(r * lit(1048576.0)).cast("long"))
          .otherwise(0L).as("r_fp"))
    }: _*)).as("p"))
      .select("p.*")
  }

  /** Per-group Pearson correlation (E175): [[correlationMatrix]]'s exact
    * moment math for one (x, y) pair, keyed by a group column — "does
    * quality track length the same way in every feed". Same quantization
    * and double-finish discipline; groups with zero variance on either
    * side report r_fp = 0.
    *
    * Scale: one hash aggregation keyed by group (map-side combined), no
    * window, no join.
    */
  def correlationBy(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    def qc(c: String) = floor(col(c).cast("double") * 10000.0 + 0.5).cast(dec)
    val a = df.select(col(groupCol).as("grp"), qc(xCol).as("x"), qc(yCol).as("y"))
      .groupBy("grp")
      .agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val dx = col("n") * col("sxx") - col("sx") * col("sx")
    val dy = col("n") * col("syy") - col("sy") * col("sy")
    val r = num.cast("double") / (sqrt(dx.cast("double")) * sqrt(dy.cast("double")))
    a.select(col("grp").as(groupCol), col("n").cast("long").as("n"),
      when(dx > 0 && dy > 0, floor(r * lit(1048576.0)).cast("long"))
        .otherwise(0L).as("r_fp"))
  }

  /** Dependence audit (E158): bucket two numeric columns into equi-depth
    * quantiles and report the exact contingency deviation from
    * independence per cell:
    *
    *   dev_num = n_cell·N − row_n·col_n      (0 everywhere ⟺ independent)
    *
    * The "is quality just length in disguise?" check run before a scoring
    * gate ships — a strong diagonal means the two signals are redundant
    * and one threshold silently implements the other. All integers; the
    * quantile assignment is [[graft.ext.Curriculum.equiDepthBuckets]]'
    * value-level broadcast layout (windows run over distinct values only).
    *
    * Scale: two distinct-value histograms + broadcast join-backs, one
    * hash aggregation to ≤ buckets² cells.
    */
  def dependenceAudit(
      df: DataFrame, aCol: String, bCol: String, buckets: Int = 5): DataFrame = {
    // pin the slim two-column frame once: each equi-depth pass histograms
    // AND joins on its column, so an expensive upstream scoring expression
    // would otherwise be re-evaluated 4+ times (the rankFusion discipline)
    val base = df.select(col(aCol), col(bCol)).localCheckpoint()
    val withA = graft.ext.Curriculum.equiDepthBuckets(base, aCol, buckets)
      .withColumnRenamed("bucket", "a_bucket")
    val withB = graft.ext.Curriculum.equiDepthBuckets(withA, bCol, buckets)
      .withColumnRenamed("bucket", "b_bucket")
    val cells = withB.groupBy("a_bucket", "b_bucket").agg(count(lit(1)).as("n_cell"))
    val rows = cells.groupBy("a_bucket").agg(sum(col("n_cell")).as("row_n"))
    val cols = cells.groupBy("b_bucket").agg(sum(col("n_cell")).as("col_n"))
    val total = cells.agg(sum(col("n_cell")).as("n"))
    cells.join(rows, "a_bucket").join(cols, "b_bucket").crossJoin(broadcast(total))
      .select(
        col("a_bucket"), col("b_bucket"), col("n_cell"),
        col("row_n").cast("long").as("row_n"),
        col("col_n").cast("long").as("col_n"),
        (col("n_cell") * col("n") - col("row_n") * col("col_n")).cast("long")
          .as("dev_num"))
  }
}
