package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for multi-column scan
  * locality.
  *
  * A table range-partitioned and sorted by the interleaved bits of k filter
  * columns keeps rows that are close in ALL k dimensions inside the same
  * files, so parquet min/max (and any downstream file-pruning catalog) can
  * skip most of the table for a conjunctive range predicate on any subset
  * of those columns — the standard multi-dimensional clustering layout for
  * 100 TB scans where single-column sort only helps the leading column.
  *
  * The z-value is a STATIC sum of `bits` masked-shift terms per column —
  * all literal shifts, fully codegen'd, no UDF, no array allocation.
  */
object Layout {

  /** Morton/Z value interleaving the low `bits` bits of each column
    * (column j occupies bit positions k·i + j). Inputs are masked to
    * `bits`, so callers quantize wider domains first (e.g. `x div width`).
    * k·bits must fit in a signed long: require k·bits <= 62.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "at least one column")
    require(cols.size * bits <= 62, s"${cols.size} cols x $bits bits overflows long")
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield (shiftright(c.cast("long"), i).bitwiseAND(lit(1L))) *
      lit(1L << (i.toLong * k + j))
    terms.reduce(_ + _)
  }

  /** The same term list as DuckDB SQL — the oracle must interleave with
    * bit-identical arithmetic, so both engines generate from this one loop.
    */
  def zValueSql(cols: Seq[String], bits: Int = 16): String = {
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"((CAST($c AS BIGINT) >> $i) & 1) * ${1L << (i.toLong * k + j)}"
    terms.mkString("(", " + ", ")")
  }

  /** Write `df` clustered by the z-order of `cols`: range-partition on the
    * z-value (equal-size partitions via range sampling), sort inside each,
    * drop the helper column. One shuffle; file count = `numFiles`.
    */
  def writeZOrdered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      numFiles: Int,
      bits: Int = 16): Unit =
    df.withColumn("__z", zValue(cols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
