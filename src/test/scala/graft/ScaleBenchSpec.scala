package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scaling harness's exponent fit is load-bearing evidence (SCALING.md
  * asserts measured ≤ documented bounds), so the fit itself is pinned on
  * exact power laws and on noisy-but-bounded samples.
  */
class ScaleBenchSpec extends AnyFunSuite {

  test("fitSlope recovers exact power-law exponents") {
    def pts(exp: Double): Seq[(Int, Double)] =
      Seq(1, 2, 4, 8).map(k => k -> math.pow(k.toDouble, exp))
    assert(math.abs(ScaleBench.fitSlope(pts(1.0)) - 1.0) < 1e-9)
    assert(math.abs(ScaleBench.fitSlope(pts(2.0)) - 2.0) < 1e-9)
    assert(math.abs(ScaleBench.fitSlope(pts(0.0)) - 0.0) < 1e-9)
  }

  test("fitSlope is scale-invariant and tolerant of multiplicative noise") {
    // 7x constant factor (a slower machine) must not change the exponent
    val base = Seq(1, 2, 4, 8).map(k => k -> 7.0 * k * k)
    assert(math.abs(ScaleBench.fitSlope(base) - 2.0) < 1e-9)
    // ±10% noise moves a true exponent 1 by well under the 0.15 tolerance
    val noisy = Seq(1 -> 1.1, 2 -> 1.8, 4 -> 4.4, 8 -> 7.6)
    val s = ScaleBench.fitSlope(noisy)
    assert(s > 0.85 && s < 1.15, s"noisy fit drifted: $s")
  }
}
