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
}
