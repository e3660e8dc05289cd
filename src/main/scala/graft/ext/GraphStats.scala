package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural statistics of a pair graph — the QA layer over near-dup /
  * similarity edge sets. A dedup candidate graph whose clustering
  * coefficient is near 1 is made of tight cliques (true duplicate groups);
  * one near 0 at high edge count signals chained false positives gluing
  * unrelated documents into giant clusters before connected components
  * runs.
  *
  * Triangle counting uses the ordered-edge discipline (each triangle
  * a < b < c counted exactly once via two content-keyed equi-joins — the
  * standard distributed formulation, cf. Suri & Vassilvitskii, "Counting
  * triangles and the curse of the last reducer", WWW 2011, public):
  * wedge generation joins e1(a,b) ⋈ e2(b,c), closure is a semi-join
  * against e3(a,c). Both joins key on node ids, so parallelism scales
  * with the graph; hub nodes cost d² wedges (mitigate upstream by capping
  * bucket sizes, as the LSH candidate generation already does).
  */
object GraphStats {

  /** One-row census: nodes, edges, triangles, wedges (open+closed paths of
    * length 2), and the global clustering coefficient 3·T/W (0.0 for a
    * wedgeless graph). Edges are undirected: (src,dst) is normalized to
    * (min,max), self-loops dropped, duplicates collapsed — all integer
    * arithmetic except the final single IEEE division.
    */
  def triangleCensus(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val edges = pairs
      .select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

    val degrees = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))

    // a<b<c: wedges rooted at the middle node b, closed by the (a,c) edge
    val e1 = edges.select(col("a").as("a"), col("b").as("b"))
    val e2 = edges.select(col("a").as("b2"), col("b").as("c"))
    val triangles = e1
      .join(e2, col("b") === col("b2"))
      .select(col("a"), col("c"))
      .join(edges.select(col("a").as("ta"), col("b").as("tc")),
        col("a") === col("ta") && col("c") === col("tc"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))

    val counts = edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(degrees.agg(
        count(lit(1)).as("n_nodes"),
        // d·(d−1) is even, so a right shift IS the exact halving (no
        // double division that could round at huge degrees)
        coalesce(sum(shiftright(col("d") * (col("d") - 1), 1)), lit(0L))
          .cast("long").as("n_wedges"))))
      .crossJoin(broadcast(triangles))
    counts.select(
      col("n_nodes"), col("n_edges"), col("n_triangles"), col("n_wedges"),
      when(col("n_wedges") === 0, lit(0.0))
        .otherwise((col("n_triangles") * 3).cast("double") / col("n_wedges").cast("double"))
        .as("clustering"))
  }

  /** Integer-exact weighted PageRank over a directed edge list — node
    * importance for transition graphs, citation/dup graphs, or any edge
    * set the dedup pipeline produces.
    *
    * Ranks are fixed-point integers summing to ≈`scale`; all steps are
    * integer multiply + floor division (both engines agree exactly:
    * Spark `div` == DuckDB `//` on non-negative longs), so `iterations`
    * unrolled rounds hash-match a SQL oracle (q130) with zero float drift:
    *
    *   contrib(i→j) = (r_i · w_ij) div W_i          (W_i = Σ out-weight)
    *   r'_j = (dampDen−dampNum)·scale div (dampDen·N)
    *          + dampNum·Σ contrib(·→j) div dampDen
    *
    * Dangling nodes (no out-edges) keep receiving the uniform term but
    * their mass is dropped, not redistributed — documented deviation from
    * the redistribute variant; floor losses likewise decay total mass by
    * < N per round. Overflow bound: `scale · max(w) < 2⁶³` (defaults give
    * headroom for per-edge weights up to ~9·10⁶).
    *
    * Scale: ranks and out-weights are node-scale, edges are data-scale.
    * Each round is one broadcast-joined pass over the edges plus a
    * groupBy(dst) shuffle — parallelism follows edge-partition count, and
    * nothing node-scale ever sorts. The single driver-side scalar is N
    * (one count), which sizes the uniform terms.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iterations: Int = 3,
      dampNum: Long = 85,
      dampDen: Long = 100,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0,1)")
    val e = edges
      .select(
        col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0)
    val outw = e.groupBy("src").agg(sum(col("w")).as("wout"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)
    var ranks = nodes.withColumn("r", lit(scale / n))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(outw, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("(r * w) div wout").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(
          col("node"),
          (lit(base) +
            expr(s"($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen"))
            .as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }

  /** k-core of a pair graph (E212): peel nodes of degree < k until
    * fixpoint and return the survivors with their in-core degree — the
    * dense center of the duplication graph. A template farm / mirror
    * network survives peeling (every member ties to many others); a doc
    * with one accidental near-dup partner does not. The structural triage
    * BETWEEN q44's components (which lump hangers-on into the cluster)
    * and q118's triangles (which only see 3-cycles).
    *
    * Peeling is monotone (removals only ever cascade), so the fixpoint is
    * the unique maximal subgraph with all degrees ≥ k, and extra rounds
    * after convergence are no-ops — the property the unrolled oracle
    * leans on.
    *
    * Scale: each round is one degree aggregation + two semi-joins over
    * the surviving edge set, lineage-truncated per round
    * (localCheckpoint, the dedupClusters discipline). Convergence is
    * detected by edge count; rounds are bounded by the peeling depth
    * (typically a handful on heavy-tailed dup graphs), never |V|
    * sequential steps of driver work.
    */
  def kCore(
      pairs: DataFrame,
      k: Int,
      srcCol: String = "id_a",
      dstCol: String = "id_b",
      maxIters: Int = 30): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val p = pairs.localCheckpoint(true)
    var edges = p.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(p.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .localCheckpoint(true)
    var before = edges.count()
    var converged = before == 0L
    var i = 0
    while (!converged && i < maxIters) {
      val keep = edges.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("u")
      val next = edges
        .join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .localCheckpoint(true)
      val after = next.count()
      converged = after == before || after == 0L
      before = after
      edges = next
      i += 1
    }
    edges.groupBy(col("u").as("id")).agg(count(lit(1)).as("core_degree"))
  }

  /** Modularity of the SOURCE partition over the near-duplicate graph:
    * per source c, e_in edges inside it, d_sum its degree mass, and the
    * exact integer modularity contribution 4m·e_in − d_sum² (the classic
    * e_c/m − (d_c/2m)² scaled by 4m², so no floats), plus its 2²⁰
    * fixed-point value. High total modularity = duplication stays inside
    * feeds (dedup per-source is enough); low/negative = feeds copy EACH
    * OTHER and cross-source dedup is mandatory — the structural version of
    * Dedup.dupSourceMatrix's pair counts.
    *
    * Scale: edges are LSH-candidate-scoped near-dup pairs (never O(n²));
    * everything after is |sources|- and |nodes|-bounded aggregation.
    */
  def sourceModularity(docs: DataFrame, minJaccard: Double = 0.5): DataFrame = {
    val pairs = Dedup.nearDuplicates(docs, minJaccard = minJaccard)
      .select("id_a", "id_b")
    val src = docs.select(col("doc_id").as("id"), col("source"))
    val e = pairs
      .join(src.select(col("id").as("id_a"), col("source").as("src_a")), Seq("id_a"))
      .join(src.select(col("id").as("id_b"), col("source").as("src_b")), Seq("id_b"))
    val m = e.agg(count(lit(1)).as("m"))
    val eIn = e.filter(col("src_a") === col("src_b"))
      .groupBy(col("src_a").as("source")).agg(count(lit(1)).as("e_in"))
    val bySource = e.select(col("id_a").as("id"))
      .unionAll(e.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .join(src, Seq("id"))
      .groupBy("source").agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("d_sum"))
    val num = col("e_in") * 4L * col("m") - col("d_sum") * col("d_sum")
    bySource.join(eIn, Seq("source"), "left")
      .na.fill(0L, Seq("e_in"))
      .crossJoin(broadcast(m))
      .select(col("source"), col("n_nodes"),
        col("e_in").cast("long").as("e_in"), col("d_sum").cast("long").as("d_sum"),
        col("m").cast("long").as("m"), num.cast("long").as("contrib_num"),
        when(col("m") === 0L, 0L)
          .otherwise(graft.ext.ExactMath.floorDiv(
            num * lit(1048576L), col("m") * col("m") * 4L))
          .cast("long").as("contrib_fp"))
  }

  /** B³ (B-cubed) clustering quality (E146) of a cluster assignment against
    * a gold partition, as exact integers: per item, precision is
    * |C(i)∩G(i)|/|C(i)| and recall |C(i)∩G(i)|/|G(i)|; summing over items
    * collapses to Σ_cells n_cg²/n_c (resp. /n_g) over the (cluster, gold)
    * contingency cells. Each cell's contribution floors into 2²⁰ fixed
    * point, then the item-mean floors once more — deterministic in both
    * engines (floor-of-floor, no float division). F1 is the harmonic mean
    * of the two fixed-point means.
    *
    * The dedup-quality gate: cluster = near-dup cluster id, gold = any
    * trusted partition (exact-dup groups, source feeds, labels) — B³ is
    * the standard extrinsic measure for entity-resolution/dedup clusters
    * (Bagga & Baldwin '98; Amigó et al. '09).
    *
    * Scale: one hash aggregation to contingency cells (≤ min(|C|,|G|)²
    * rows, map-side combined), two marginal aggregations over those cells,
    * one 1-row reduce. Nothing corpus-sized is ever joined or windowed.
    */
  def bcubed(
      assign: DataFrame,
      idCol: String,
      clusterCol: String,
      goldCol: String): DataFrame = {
    val a = assign.select(col(idCol).as("id"),
      col(clusterCol).as("c"), col(goldCol).as("g"))
      .filter(col("c").isNotNull && col("g").isNotNull)
    val cells = a.groupBy("c", "g").agg(count(lit(1)).as("ncg"))
    val cs = cells.groupBy("c").agg(sum(col("ncg")).as("nc"))
    val gs = cells.groupBy("g").agg(sum(col("ncg")).as("ng"))
    val j = cells.join(cs, "c").join(gs, "g")
    val fp = lit(1048576L)
    val t = j.agg(
      sum(col("ncg")).cast("long").as("n_items"),
      countDistinct(col("c")).cast("long").as("n_clusters"),
      countDistinct(col("g")).cast("long").as("n_gold"),
      sum(graft.ext.ExactMath.floorDiv(col("ncg") * col("ncg") * fp, col("nc")))
        .cast("long").as("psum"),
      sum(graft.ext.ExactMath.floorDiv(col("ncg") * col("ncg") * fp, col("ng")))
        .cast("long").as("rsum"))
    val p = graft.ext.ExactMath.floorDiv(col("psum"), col("n_items"))
    val r = graft.ext.ExactMath.floorDiv(col("rsum"), col("n_items"))
    t.select(
      col("n_items"), col("n_clusters"), col("n_gold"),
      p.as("prec_fp"), r.as("rec_fp"),
      when(p + r > 0L,
        graft.ext.ExactMath.floorDiv(lit(2L) * p * r, p + r)).otherwise(0L)
        .cast("long").as("f1_fp"))
  }
}
