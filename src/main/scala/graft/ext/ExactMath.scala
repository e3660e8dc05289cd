package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Integer math that stays exact across engines and magnitudes.
  *
  * `floor(a.cast(decimal) / b)` is NOT a safe integer division: Spark's
  * decimal divide rounds half-up at the result scale (6 after precision
  * clamping), so a true quotient of n − 1/d with d > 2·10⁶ rounds UP to n
  * before the floor — an off-by-one that only appears at 100 TB-scale
  * denominators (and breaks hash-exact oracles when it does). Subtracting
  * the remainder first makes the quotient integral, and integral values are
  * exact in decimal at any scale.
  */
object ExactMath {

  /** a div b (floor division) for non-negative integral columns, exact for
    * |a| < 10³², codegen-friendly (mod + subtract + decimal divide).
    */
  def floorDiv(a: Column, b: Column): Column =
    ((a.cast("decimal(38,0)") - pmod(a, b).cast("decimal(38,0)")) /
      b.cast("decimal(38,0)")).cast("long")
}
