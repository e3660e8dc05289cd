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
}
