package graft.ext

import graft.SparkSpec

class GraphStatsSpec extends SparkSpec {

  private def census(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    GraphStats.triangleCensus(edges.toDF("x", "y"), "x", "y").collect().head
  }

  test("triangle: K3 has 1 triangle, 3 wedges, clustering 1.0") {
    val r = census(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(r.getAs[Long]("n_nodes") === 3L)
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("n_triangles") === 1L)
    assert(r.getAs[Long]("n_wedges") === 3L)
    assert(r.getAs[Double]("clustering") === 1.0)
  }

  test("path: 3-node chain has 0 triangles, 1 wedge, clustering 0") {
    val r = census(Seq((1L, 2L), (2L, 3L)))
    assert(r.getAs[Long]("n_triangles") === 0L)
    assert(r.getAs[Long]("n_wedges") === 1L)
    assert(r.getAs[Double]("clustering") === 0.0)
  }

  test("K4 counted once per triangle regardless of edge orientation/duplicates") {
    // K4: 4 triangles, every vertex degree 3 -> 4·3 = 12 wedges
    val base = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val noisy = base ++ base.map(_.swap) ++ Seq((2L, 2L)) // reversed dups + self-loop
    val r = census(noisy)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    assert(r.getAs[Long]("n_wedges") === 12L)
    assert(r.getAs[Double]("clustering") === 1.0)
  }

  test("edgeless/wedgeless graphs do not divide by zero") {
    val r = census(Seq((1L, 2L)))
    assert(r.getAs[Long]("n_wedges") === 0L)
    assert(r.getAs[Double]("clustering") === 0.0)
  }

  /** Driver-side reference PageRank with the exact same integer semantics
    * — the spec-level twin of the SQL oracle unrolling.
    */
  private def refPageRank(
      edges: Seq[(String, String, Long)], iters: Int,
      scale: Long = 1000000000000L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val base = (15L * scale) / (100L * n)
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => (r(s) * w) / outw(s) }.sum).toMap
      r = nodes.map(v => v -> (base + (85L * in.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("pageRank matches the integer reference on a weighted digraph with a dangling node") {
    import spark.implicits._
    // d is dangling (no out-edges); a is a hub; weights are uneven
    val edges = Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("b", "d", 5L))
    val got = GraphStats
      .pageRank(edges.toDF("s", "t", "w"), "s", "t", "w", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === refPageRank(edges, 3))
    // sink d outranks equally-uniform c's source a? just sanity: all positive
    assert(got.values.forall(_ > 0))
    // floor-only loss: total mass never exceeds scale
    assert(got.values.sum <= 1000000000000L)
  }

  test("pageRank per-round joins broadcast the node-scale rank map") {
    import spark.implicits._
    val edges = (1 to 200).map(i => (s"n${i % 20}", s"n${(i * 7) % 20}", 1L))
    val plan = GraphStats.pageRank(edges.toDF("s", "t", "w"), "s", "t", "w")
      .queryExecution.executedPlan.toString
    // ranks and out-weights are node-scale: every per-round join against the
    // edge list must be a broadcast, never a sort-merge of the edges
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("pageRank is insensitive to edge-list order and duplicate-free weights sum") {
    import spark.implicits._
    val edges = Seq(("a", "b", 1L), ("b", "a", 2L), ("a", "c", 2L), ("c", "b", 1L))
    val fwd = GraphStats.pageRank(edges.toDF("s", "t", "w"), "s", "t", "w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rev = GraphStats.pageRank(edges.reverse.toDF("s", "t", "w"), "s", "t", "w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fwd === rev)
    assert(fwd === refPageRank(edges, 3))
  }

  test("sourceModularity: hand-computed contributions, cross-source edges penalize") {
    import spark.implicits._
    val baseA = "the quick brown fox jumps over the lazy dog near the river today again"
    val baseB = "pack my box with five dozen liquor jugs while the band plays on stage"
    // near-dup pairs by construction: (1,2) within s1, (3,4) ACROSS s1/s2
    val docs = Seq(
      (1L, baseA + " one", "s1"), (2L, baseA + " one really", "s1"),
      (3L, baseB + " two", "s1"), (4L, baseB + " two indeed", "s2"),
      (5L, "completely different text about unrelated matters entirely", "s2")
    ).toDF("doc_id", "text", "source")
    val out = GraphStats.sourceModularity(docs, minJaccard = 0.5).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // m = 2 edges; s1: e_in=1, nodes {1,2,3} degrees 1,1,1 → d_sum 3
    // s2: e_in=0, node {4} degree 1 → d_sum 1
    val s1 = out("s1")
    assert(s1.getAs[Long]("m") === 2L)
    assert(s1.getAs[Long]("e_in") === 1L)
    assert(s1.getAs[Long]("d_sum") === 3L)
    assert(s1.getAs[Long]("contrib_num") === 4L * 2 * 1 - 9L) // -1
    val s2 = out("s2")
    assert(s2.getAs[Long]("e_in") === 0L)
    assert(s2.getAs[Long]("d_sum") === 1L)
    assert(s2.getAs[Long]("contrib_num") === -1L)
    // floor division toward -∞ on the negative numerator: -2^20/16 = -65536
    assert(s1.getAs[Long]("contrib_fp") === -65536L)
  }

  test("bcubed: perfect, merged, and split clusterings score as hand-computed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def score(rows: Seq[(Long, String, String)]) =
      GraphStats.bcubed(rows.toDF("id", "c", "g"), "id", "c", "g").collect()(0)
    val fp = 1048576L
    // identical partitions → precision = recall = f1 = 1
    val perfect = score(Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "b", "y")))
    assert(perfect.getAs[Long]("prec_fp") === fp)
    assert(perfect.getAs[Long]("rec_fp") === fp)
    assert(perfect.getAs[Long]("f1_fp") === fp)
    // everything merged into one cluster vs gold {x,x},{y,y}:
    // precision per item = 2/4, recall = 1 → prec 0.5, rec 1
    val merged = score(Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y"), (4L, "a", "y")))
    assert(merged.getAs[Long]("prec_fp") === fp / 2)
    assert(merged.getAs[Long]("rec_fp") === fp)
    // f1 = 2pr/(p+r) = 2·(1/2)·1 / (3/2) = 2/3 (floored)
    assert(merged.getAs[Long]("f1_fp") === (2L * (fp / 2) * fp) / (fp / 2 + fp))
    // fully split vs one gold class: precision 1, recall per item = 1/2
    val split = score(Seq((1L, "a", "x"), (2L, "b", "x")))
    assert(split.getAs[Long]("prec_fp") === fp)
    assert(split.getAs[Long]("rec_fp") === fp / 2)
    // null gold rows are excluded before counting
    val withNull = GraphStats.bcubed(
      Seq((1L, "a", "x"), (2L, "a", null.asInstanceOf[String]))
        .toDF("id", "c", "g"), "id", "c", "g").collect()(0)
    assert(withNull.getAs[Long]("n_items") === 1L)
  }

  test("kCore: triangle survives, pendants/pairs/chains peel away") {
    import spark.implicits._
    // triangle 1-2-3, pendant 4-1, isolated pair 5-6, path 7-8-9
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // triangle: 2-core
      (4L, 1L), //                     pendant on the triangle
      (5L, 6L), //                     isolated edge
      (7L, 8L), (8L, 9L)) //           path: middle depends on peeled ends
      .toDF("id_a", "id_b")
    val core2 = GraphStats.kCore(pairs, k = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("core_degree")).toMap
    assert(core2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      "only the triangle has min degree 2 after cascading removals")
    // k=1 keeps every non-isolated node at its full degree
    val core1 = GraphStats.kCore(pairs, k = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("core_degree")).toMap
    assert(core1 === Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 1L,
      5L -> 1L, 6L -> 1L, 7L -> 1L, 8L -> 2L, 9L -> 1L))
    // k=3 empties this graph (triangle degrees are only 2)
    assert(GraphStats.kCore(pairs, k = 3).count() === 0L)
  }

  test("kCore: a long chain cascades over multiple peel rounds to empty") {
    import spark.implicits._
    val chain = (1L to 9L).sliding(2).map { case Seq(a, b) => (a, b) }
      .toSeq.toDF("id_a", "id_b")
    assert(GraphStats.kCore(chain, k = 2).count() === 0L,
      "each round only exposes the next ends — needs the cascade to finish")
  }
}
