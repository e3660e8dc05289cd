package graft.analyze

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BenfordSpec extends SparkSpec {

  test("expectedFp: masses are the Benford constants and sum to ~10^9") {
    assert(Benford.expectedFp.head === 301029995L) // log10(2)
    assert(Benford.expectedFp.length === 9)
    assert(Benford.expectedFp === Benford.expectedFp.sorted.reverse)
    val s = Benford.expectedFp.sum
    assert(s > 999999990L && s <= 1000000000L) // floor rounding only
  }

  test("audit: counts, group totals, and integer deviation are exact") {
    import spark.implicits._
    val df = Seq(
      ("g1", 10.7), ("g1", 19.0), ("g1", 25.0), ("g1", 999.9),
      ("g2", 1.0), ("g2", 0.4) // 0.4 floors below 1 → out of domain
    ).toDF("g", "x")
    val got = Benford.audit(df, floor(col("x")), "g")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    // g1: digits 1,1,2,9 → n_grp 4
    val e1 = Benford.expectedFp(0)
    val e2 = Benford.expectedFp(1)
    val e9 = Benford.expectedFp(8)
    assert(got(("g1", 1)) === ((2L, 4L, math.abs(2L * 1000000000L - 4L * e1))))
    assert(got(("g1", 2)) === ((1L, 4L, math.abs(1L * 1000000000L - 4L * e2))))
    assert(got(("g1", 9)) === ((1L, 4L, math.abs(1L * 1000000000L - 4L * e9))))
    assert(got(("g2", 1)) === ((1L, 1L, math.abs(1L * 1000000000L - 1L * e1))))
    assert(!got.contains(("g2", 0)))
  }
}
