package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass distribution-delta sketch (SURVEY §7.3's "optional custom
  * `Aggregator[IN,BUF,OUT]`" for distribution similarity) — the UDAF surface
  * of the engine (§2.9).
  *
  * Input rows are (value-count-src, value-count-tgt) pairs from an OUTER
  * join of two frequency tables; the aggregator accumulates the integer
  * delta sum and both totals in one pass, yielding the same similarity
  * number as DataTester.distributionSimilarity without re-reading the
  * joined set. Merge is associative/commutative (plain sums), so partial
  * aggregation applies.
  */
object DistributionDelta {

  /** (cntSrc, cntTgt) per joined value; 0 where absent. */
  case class In(cntSrc: Long, cntTgt: Long)

  /** Accumulator: totals, common-value count, and the cross-product delta
    * pieces needed to finish Σ|pA−pB| exactly at the end.
    */
  case class Buf(
      totSrc: Long, totTgt: Long, nSrc: Long, common: Long,
      pairs: Vector[(Long, Long)])

  case class Out(distSimilarity: Double, common: Long, nSrc: Long)

  val aggregator: Aggregator[In, Buf, Out] = new Aggregator[In, Buf, Out] {
    def zero: Buf = Buf(0L, 0L, 0L, 0L, Vector.empty)

    def reduce(b: Buf, a: In): Buf = Buf(
      b.totSrc + a.cntSrc,
      b.totTgt + a.cntTgt,
      b.nSrc + (if (a.cntSrc > 0) 1 else 0),
      b.common + (if (a.cntSrc > 0 && a.cntTgt > 0) 1 else 0),
      if (a.cntSrc > 0 && a.cntTgt > 0) b.pairs :+ (a.cntSrc, a.cntTgt) else b.pairs)

    def merge(x: Buf, y: Buf): Buf = Buf(
      x.totSrc + y.totSrc, x.totTgt + y.totTgt,
      x.nSrc + y.nSrc, x.common + y.common, x.pairs ++ y.pairs)

    def finish(b: Buf): Out = {
      if (b.common == 0 || b.nSrc == 0) Out(0.0, b.common, b.nSrc)
      else {
        // Σ|cntA·totB − cntB·totA| needs the final totals, hence the pair
        // buffer; counts per distinct value keep it bounded by value
        // cardinality (the joined set is already a frequency table).
        val deltaSum = b.pairs.iterator
          .map { case (ca, cb) => math.abs(ca * b.totTgt - cb * b.totSrc) }
          .sum
        val avgSim = 1.0 - deltaSum.toDouble / (b.totSrc.toDouble * b.totTgt) / b.common
        Out(avgSim * (b.common.toDouble / b.nSrc), b.common, b.nSrc)
      }
    }

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }
}
