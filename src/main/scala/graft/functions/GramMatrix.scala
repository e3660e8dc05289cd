package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass Gram-matrix aggregate over an embedding column: Σᵥ qᵥqᵥᵀ for
  * the upper triangle, with components quantized to ⌊x·2¹⁰⌋ integers so
  * the sums are exact and engine-portable (the same fixed-point discipline
  * as the k-means centroid sums).
  *
  * The naive formulation — posexplode twice and groupBy (i, j) — shuffles
  * dim²·n rows; this Aggregator keeps one dim·(dim+1)/2 long buffer per
  * partition and merges buffers, so the shuffle carries ONE buffer per map
  * task regardless of corpus size. The Gram matrix is the raw material for
  * embedding-quality diagnostics: off-diagonal mass = correlated
  * (redundant) dimensions, near-zero diagonal = dead dimensions, and
  * (after centering) it is n·covariance for PCA-style whitening decisions.
  */
object GramMatrix {

  case class In(vec: Seq[Float])

  /** n vectors seen + row-major upper-triangle sums (i ≤ j). */
  case class Buf(n: Long, sums: Seq[Long])

  case class Gram(dim: Int) extends Aggregator[In, Buf, Buf] {
    require(dim > 0, s"dim must be positive, got $dim")
    private val size = dim * (dim + 1) / 2

    def zero: Buf = Buf(0L, Vector.fill(size)(0L))

    def reduce(b: Buf, a: In): Buf = {
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        q(i) = math.floor(a.vec(i).toDouble * 1024.0).toLong
        i += 1
      }
      val s = b.sums.toArray
      var t = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) { s(t) += q(i) * q(j); t += 1; j += 1 }
        i += 1
      }
      Buf(b.n + 1, s.toIndexedSeq)
    }

    def merge(x: Buf, y: Buf): Buf =
      Buf(x.n + y.n, x.sums.lazyZip(y.sums).map(_ + _))

    def finish(b: Buf): Buf = b

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Untyped-API entry: `df.agg(gram(64)(col("embedding")).as("g"))`, then
    * `posexplode(col("g.sums"))` — pos decodes to (i, j) row-major upper.
    */
  def gram(dim: Int): Column => Column = {
    val f = udaf(Gram(dim), Encoders.product[In])
    v => f(v)
  }
}
