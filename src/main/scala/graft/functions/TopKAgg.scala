package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-per-group aggregate — the scale-correct alternative to the
  * `row_number() OVER (PARTITION BY g ORDER BY …) <= k` window pattern.
  *
  * The window formulation shuffles and SORTS every row of every group; this
  * aggregate keeps a k-bounded ordered buffer per group and merges buffers
  * associatively, so Spark runs it as a hash aggregate with a PARTIAL pass:
  * each map task ships at most k rows per group per partition, and no sort
  * ever happens. At 100 TB the window plan moves the whole table through one
  * shuffle-and-sort; this plan moves ≤ k·partitions rows per group.
  *
  * Ordering is total and deterministic — score DESC, then id ASC — so the
  * result is bit-identical to the `row_number` formulation (proved in
  * TopKAggSpec) and hash-matches a DuckDB oracle (q127).
  */
object TopKAgg {

  /** One candidate: integer score (scale floats before calling — floor to a
    * fixed point; see q127) and a unique tiebreak id.
    */
  case class In(score: Long, id: Long)

  /** Buffer and result: the current top-k, ordered best-first. Wrapped in a
    * case class so the product encoder applies; the column value is a struct
    * with an `items` array to `posexplode` (pos + 1 == rank).
    */
  case class Buf(items: Seq[In])

  /** `a` sorts strictly before `b` (score DESC, id ASC). */
  private def beats(a: In, b: In): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  case class TopK(k: Int) extends Aggregator[In, Buf, Buf] {
    require(k > 0, s"k must be positive, got $k")

    def zero: Buf = Buf(Vector.empty)

    private def insert(b: Seq[In], a: In): Seq[In] =
      if (b.length >= k && !beats(a, b.last)) b
      else {
        val i = b.indexWhere(e => beats(a, e))
        val at = if (i < 0) b.length else i
        val grown = (b.take(at) :+ a) ++ b.drop(at)
        if (grown.length > k) grown.take(k) else grown
      }

    def reduce(b: Buf, a: In): Buf = Buf(insert(b.items, a))

    def merge(x: Buf, y: Buf): Buf = Buf(y.items.foldLeft(x.items)(insert))

    def finish(b: Buf): Buf = b

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Untyped-API entry: `df.groupBy(g).agg(topK(5)(score, id).as("tk"))` then
    * `posexplode(col("tk.items"))` for (rank-1, {score, id}) rows.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(TopK(k), Encoders.product[In])
    (score, id) => f(score, id)
  }
}
