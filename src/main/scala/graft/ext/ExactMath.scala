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
    * |a| < 10³² when the caller passes decimal inputs (long inputs stay in
    * primitive long arithmetic — `a − pmod(a, b)` is an exact multiple of
    * b, and SQL `div` (IntegralDivide) truncates, which on an integral
    * quotient IS the floor). The previous form cast every operand to
    * decimal(38,0) and divided in BigDecimal — ~50× the per-row cost of a
    * primitive divide on the long-typed hot paths (bucketing, fixed-point
    * ratios); `div` keeps decimals exact too, so wide callers are
    * unchanged.
    */
  def floorDiv(a: Column, b: Column): Column =
    call_function("div", a - pmod(a, b), b)
}
