package graft.datatest

import graft.core.DetectionConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-level relationship validation (SURVEY §2.4 A1-A4, A9-A10; §2.3
  * J9-J10) — the reference's DataRelationshipTester
  * (data_relationship_tester.py:42-387) re-expressed as Spark jobs.
  *
  * Scale notes (SURVEY §7.4.4): the reference samples each endpoint with a
  * per-pair `LIMIT n` SQL query. A LIMIT at 100 TB reads one partition's
  * skew; we use `sample(fraction)` (uniform across partitions) or the full
  * column — and the distinct-before-join shrinks every shuffle to key
  * cardinality. Exact distinct can be swapped for HLL
  * (`approx_count_distinct`) above a cardinality threshold without changing
  * the interface.
  */
object DataTester {

  /** J9 — referential integrity: |distinct src ∩ distinct tgt| /
    * |distinct src|, orphan values via anti-join
    * (data_relationship_tester.py:153-177, 91).
    */
  def referentialIntegrity(
      src: DataFrame, srcCol: String,
      tgt: DataFrame, tgtCol: String): DataFrame = {
    val s = src.select(col(srcCol).as("v")).where(col("v").isNotNull).distinct()
    val t = tgt.select(col(tgtCol).as("v")).where(col("v").isNotNull).distinct()
    val counts = s.join(t, Seq("v"), "left_semi").agg(count(lit(1)).as("matched"))
      .crossJoin(s.agg(count(lit(1)).as("total_src")))
    counts.select(
      when(col("total_src") === 0, 0.0)
        .otherwise(col("matched").cast("double") / col("total_src")).as("ri_ratio"),
      (col("total_src") - col("matched")).as("orphan_values"),
      col("total_src"))
  }

  /** J9 at scale — approximate referential integrity via HLL sketches
    * (`approx_count_distinct`): no distinct shuffle at all, three partial
    * aggregates; relative error ~2.3% at the default rsd 0.023. The scale
    * path SURVEY §7.3 prescribes when exact distinct cardinality itself is
    * the bottleneck (billions of keys).
    */
  def approxReferentialIntegrity(
      src: DataFrame, srcCol: String,
      tgt: DataFrame, tgtCol: String,
      rsd: Double = 0.023): DataFrame = {
    val s = src.select(col(srcCol).as("v")).where(col("v").isNotNull)
    val t = tgt.select(col(tgtCol).as("v")).where(col("v").isNotNull)
    val nSrc = s.agg(approx_count_distinct(col("v"), rsd).as("n_src"))
    val nUnion = s.union(t).agg(approx_count_distinct(col("v"), rsd).as("n_union"))
    val nTgt = t.agg(approx_count_distinct(col("v"), rsd).as("n_tgt"))
    // |A∩B| = |A| + |B| − |A∪B| (inclusion-exclusion over sketch estimates)
    nSrc.crossJoin(nTgt).crossJoin(nUnion)
      .select(
        least(greatest(
          (col("n_src") + col("n_tgt") - col("n_union")).cast("double") / col("n_src"),
          lit(0.0)), lit(1.0)).as("ri_ratio_approx"),
        col("n_src"), col("n_tgt"), col("n_union"))
  }

  /** A1 — per-value relative frequency of one column. The total comes from a
    * broadcast single-row aggregate, not a global window — no single-partition
    * stage at scale.
    */
  def valueFrequency(df: DataFrame, c: String): DataFrame = {
    val freq = df.select(col(c).as("v")).where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    freq.crossJoin(broadcast(freq.agg(sum("cnt").as("total"))))
      .select(col("v"), col("cnt"), (col("cnt").cast("double") / col("total")).as("p"))
  }

  /** J10 — distribution similarity: inner-join the two frequency tables on
    * value; similarity = avg(1 − |p_src − p_tgt|) × common-value coverage
    * (data_relationship_tester.py:243-284).
    *
    * Numerically order-independent: rather than summing per-value double
    * deltas (whose result depends on partition order), the delta sum is the
    * exact integer Σ|cntA·totB − cntB·totA| and the final similarity is a
    * handful of double ops over exact integers — bit-identical on any
    * cluster and in the DuckDB oracle.
    */
  def distributionSimilarity(
      src: DataFrame, srcCol: String,
      tgt: DataFrame, tgtCol: String): DataFrame = {
    def freq(df: DataFrame, c: String) =
      df.select(col(c).as("v")).where(col("v").isNotNull)
        .groupBy("v").agg(count(lit(1)).as("cnt"))
    val a = freq(src, srcCol)
    val b = freq(tgt, tgtCol)
    val ta = broadcast(a.agg(sum("cnt").as("tot_a"), count(lit(1)).as("n_src")))
    val tb = broadcast(b.agg(sum("cnt").as("tot_b")))
    a.join(b.withColumnRenamed("cnt", "cnt_b"), Seq("v"))
      .crossJoin(ta).crossJoin(tb)
      .agg(
        sum(abs(col("cnt") * col("tot_b") - col("cnt_b") * col("tot_a"))).as("delta_sum"),
        count(lit(1)).as("common"),
        first("tot_a").as("tot_a"), first("tot_b").as("tot_b"),
        first("n_src").as("n_src"))
      .select(
        when(col("common") === 0 || col("n_src") === 0, lit(0.0))
          .otherwise(
            (lit(1.0) - col("delta_sum").cast("double") /
              (col("tot_a").cast("double") * col("tot_b").cast("double")) / col("common")) *
              (col("common").cast("double") / col("n_src")))
          .as("dist_similarity"),
        col("common"), col("n_src"))
  }

  /** A4 — weighted overall confidence: 0.5·RI + 0.3·type + 0.2·distribution,
    * clamped to [0,1] (data_relationship_tester.py:300-326).
    */
  def overallConfidence(ri: org.apache.spark.sql.Column,
      typeCompat: org.apache.spark.sql.Column,
      distSim: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    least(greatest(ri * 0.5 + typeCompat * 0.3 + distSim * 0.2, lit(0.0)), lit(1.0))

  /** A9 — post-test confidence adjustment: pass → min(1, c+boost);
    * fail → max(0.1, c−penalty) (enhanced_relationship_detector.py:184-195).
    * Kept as a separate boolean `data_validated` column instead of mutating
    * relationship_type (the reference's type-unsoundness, SURVEY §2.11).
    *
    * When `cfg.maxOrphanPercentage < 1` or
    * `cfg.distributionSimilarityThreshold > 0` (DataTestingConfig knobs the
    * reference parses but never consumes — dead config made live here), the
    * pass additionally requires orphan% (`orphan_values / total_src`) at or
    * under the max and `dist_similarity` at or over the threshold; `rels`
    * must then carry those testRelationships columns. At the defaults the
    * predicate compiles to the reference's confidence-only gate and no
    * extra columns are referenced.
    */
  def adjustConfidence(rels: DataFrame, cfg: DetectionConfig = DetectionConfig()): DataFrame = {
    var passed = col("overall_confidence") >= cfg.dataTestPassThreshold
    if (cfg.maxOrphanPercentage < 1.0)
      passed = passed && (
        when(col("total_src") === 0, lit(0.0))
          .otherwise(col("orphan_values").cast("double") / col("total_src"))
          <= cfg.maxOrphanPercentage)
    if (cfg.distributionSimilarityThreshold > 0.0)
      passed = passed && col("dist_similarity") >= cfg.distributionSimilarityThreshold
    rels
      .withColumn("data_validated", passed)
      .withColumn(
        "adjusted_confidence",
        when(col("data_validated"), least(col("confidence") + cfg.dataTestBoost, lit(1.0)))
          .otherwise(greatest(col("confidence") - cfg.dataTestPenalty, lit(0.1))))
  }

  /** A10 — Cochran sample size: n0 = z²·p(1−p)/moe², with finite-population
    * correction (data_relationship_tester.py:360-387). Pure driver math.
    */
  def cochranSampleSize(
      populationSize: Long,
      confidenceLevel: Double = 0.95,
      marginOfError: Double = 0.05): Long = {
    val z = confidenceLevel match {
      case cl if cl >= 0.99 => 2.576
      case cl if cl >= 0.95 => 1.96
      case _                => 1.645
    }
    val p = 0.5
    val n0 = z * z * p * (1 - p) / (marginOfError * marginOfError)
    val n = if (populationSize > 0) n0 / (1 + (n0 - 1) / populationSize.toDouble) else n0
    math.max(1L, math.ceil(n).toLong)
  }

  /** A10→S6 wiring — adaptive sampling fraction for a table: the Cochran
    * sample size over the (footer-derived) row count, as a Bernoulli
    * fraction (data_relationship_tester.py:328-358's adaptive loop, made a
    * pure function of population size). Small tables sample 1.0; a 10^9-row
    * table samples ~4·10^-7 — the data-test cost becomes O(√precision), not
    * O(rows).
    */
  def cochranFraction(
      populationSize: Long,
      confidenceLevel: Double = 0.95,
      marginOfError: Double = 0.05): Double =
    if (populationSize <= 0) 1.0
    else math.min(1.0,
      cochranSampleSize(populationSize, confidenceLevel, marginOfError).toDouble / populationSize)

  /** Data-test a SET of relationships as ONE Spark plan (SURVEY §7.4.4).
    *
    * The reference issues one sampling SQL query per relationship endpoint
    * (data_relationship_tester.py:115-121) — at thousands of candidate edges
    * over 100 TB that re-reads the same fact table once per edge. Here:
    *
    *   1. every distinct table is scanned ONCE, projected to just its tested
    *      columns, stacked into (table, column, value) rows, and aggregated
    *      into per-column frequency tables in a single shuffle keyed
    *      (t, c, v) — values cast to string for the heterogeneous stack (the
    *      cast is injective per column, so per-edge counts are unchanged);
    *   2. a broadcast edges table routes each frequency row to the edges
    *      using it as source (a-side) / target (b-side);
    *   3. ONE (edge_id, v) equi-join + ONE groupBy(edge_id) yields, per edge,
    *      `common` = |distinct src ∩ distinct tgt| (the referential-integrity
    *      intersection, J9) AND the exact-integer distribution delta sum
    *      (J10) in the same pass.
    *
    * Shuffle count is CONSTANT in the number of edges (~5), versus ~4 per
    * edge for naive per-pair testing — the difference between one pass and
    * thousands over every endpoint on a cluster.
    *
    * `sampleFraction < 1` samples every endpoint uniformly — the scale path
    * replacing the reference's LIMIT-based sampling (partition-skew-free).
    *
    * Numerics: counts and delta sums are exact integers; the few final
    * double ops are written in the same order as the DuckDB oracle, so
    * results are bit-identical on any cluster.
    */
  def testRelationships(
      spark: SparkSession, dir: String,
      edges: Seq[(String, String, String, String)],
      typeCompatible: Boolean = true,
      sampleFraction: Double = 1.0,
      sampleFractions: Map[String, Double] = Map.empty): DataFrame = {
    require(edges.nonEmpty, "testRelationships needs at least one edge")
    import spark.implicits._
    val edgeDf = edges.zipWithIndex.map { case ((st, sc, tt, tc), i) =>
      (i, st, sc, tt, tc)
    }.toDF("edge_id", "source_table", "source_column", "target_table", "target_column")

    val needed: Map[String, Seq[String]] = edges
      .flatMap { case (st, sc, tt, tc) => Seq(st -> sc, tt -> tc) }
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap

    // 1. one scan per table → (t, c, v, cnt) for every tested column.
    // Values are canonicalized BEFORE the string cast: all integral widths
    // go through bigint so an int 5 and a bigint 5 render identically
    // ("5"), preserving cross-width joins. Fractional types are rejected
    // loudly — the upstream type-group validation never routes float keys
    // here, and "5.0" vs "5.00" string drift would silently zero the
    // overlap for anyone bypassing it.
    val stacked = needed.map { case (t, cols0) =>
      val df0 = spark.read.parquet(s"$dir/$t.parquet")
      // per-table fraction (adaptive Cochran wiring) wins over the global one
      val frac = sampleFractions.getOrElse(t, sampleFraction)
      val df = if (frac < 1.0) df0.sample(frac, seed = 42) else df0
      import org.apache.spark.sql.types._
      val pairs = cols0.map { c =>
        val canonical = df0.schema(c).dataType match {
          case ByteType | ShortType | IntegerType | LongType => col(c).cast("bigint")
          case StringType | BinaryType | BooleanType | DateType => col(c)
          case dt: TimestampType => col(c)
          case other => throw new IllegalArgumentException(
            s"unsupported data-test endpoint type for $t.$c: $other — " +
              "edges must use integral/string/binary keys (the type-group " +
              "validation in RelationshipDetector enforces this)")
        }
        struct(lit(c).as("c"), canonical.cast("string").as("v"))
      }
      df.select(explode(array(pairs: _*)).as("p"))
        .select(lit(t).as("t"), col("p.c").as("c"), col("p.v").as("v"))
        .where(col("v").isNotNull)
        .groupBy("t", "c", "v").agg(count(lit(1)).as("cnt"))
    }.reduce(_ unionByName _)
      // four consumers (a-side, b-side, each read twice more for totals and
      // the overlap join) — pin the per-column frequency tables so the
      // table scans + stack aggregation run once (guide §2.4); the pinned
      // frame is frequency-table-sized (distinct values), not data-sized
      .localCheckpoint()

    // 2. route frequency rows to the edges that use them
    val aSide = stacked.join(
        broadcast(edgeDf),
        col("t") === col("source_table") && col("c") === col("source_column"))
      .select(col("edge_id"), col("v"), col("cnt").as("cnt_a"))
    val bSide = stacked.join(
        broadcast(edgeDf),
        col("t") === col("target_table") && col("c") === col("target_column"))
      .select(col("edge_id"), col("v"), col("cnt").as("cnt_b"))

    val aTot = aSide.groupBy("edge_id")
      .agg(sum("cnt_a").as("tot_a"), count(lit(1)).as("n_src"))
    val bTot = bSide.groupBy("edge_id").agg(sum("cnt_b").as("tot_b"))

    // 3. one value join + one per-edge aggregate → RI ∩ and delta sum
    val overlap = aSide.join(bSide, Seq("edge_id", "v"))
      .join(broadcast(aTot.select(col("edge_id"), col("tot_a"))), Seq("edge_id"))
      .join(broadcast(bTot), Seq("edge_id"))
      .groupBy("edge_id")
      .agg(
        count(lit(1)).as("common"),
        sum(abs(col("cnt_a") * col("tot_b") - col("cnt_b") * col("tot_a"))).as("delta_sum"))

    val tc = lit(if (typeCompatible) 1.0 else 0.0)
    val base = broadcast(edgeDf)
      .join(aTot, Seq("edge_id"), "left")
      .join(bTot, Seq("edge_id"), "left")
      .join(overlap, Seq("edge_id"), "left")
      .na.fill(0L, Seq("n_src", "common", "delta_sum", "tot_a", "tot_b"))
    val ri = when(col("n_src") === 0, 0.0)
      .otherwise(col("common").cast("double") / col("n_src"))
    val distSim = when(col("common") === 0 || col("n_src") === 0, lit(0.0))
      .otherwise(
        (lit(1.0) - col("delta_sum").cast("double") /
          (col("tot_a").cast("double") * col("tot_b").cast("double")) / col("common")) *
          (col("common").cast("double") / col("n_src")))
    base.select(
      col("source_table"), col("source_column"),
      col("target_table"), col("target_column"),
      ri.as("ri_ratio"),
      tc.as("type_compatibility"),
      distSim.as("dist_similarity"),
      overallConfidence(ri, tc, distSim).as("overall_confidence"),
      (col("n_src") - col("common")).as("orphan_values"),
      col("n_src").as("total_src"))
  }

  /** Single-edge convenience wrapper over the batched plan. */
  def testRelationship(
      spark: SparkSession, dir: String,
      sourceTable: String, sourceColumn: String,
      targetTable: String, targetColumn: String,
      typeCompatible: Boolean = true,
      sampleFraction: Double = 1.0): DataFrame =
    testRelationships(
      spark, dir, Seq((sourceTable, sourceColumn, targetTable, targetColumn)),
      typeCompatible, sampleFraction)
}
