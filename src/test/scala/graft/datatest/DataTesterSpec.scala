package graft.datatest

import graft.SparkSpec
import graft.core.DetectionConfig
import org.apache.spark.sql.functions.{col, lit}

class DataTesterSpec extends SparkSpec {

  test("referential integrity: full overlap is 1.0, orphans counted") {
    import spark.implicits._
    val src = Seq(1, 2, 2, 3).toDF("fk")
    val tgt = Seq(1, 2, 3, 4).toDF("pk")
    val r = DataTester.referentialIntegrity(src, "fk", tgt, "pk").collect().head
    assert(r.getAs[Double]("ri_ratio") === 1.0)
    assert(r.getAs[Long]("orphan_values") === 0L)

    val src2 = Seq(1, 5, 6).toDF("fk")
    val r2 = DataTester.referentialIntegrity(src2, "fk", tgt, "pk").collect().head
    assert(math.abs(r2.getAs[Double]("ri_ratio") - 1.0 / 3) < 1e-12)
    assert(r2.getAs[Long]("orphan_values") === 2L)
  }

  test("distribution similarity: identical distributions score 1.0") {
    import spark.implicits._
    val a = Seq(1, 1, 2, 3).toDF("v")
    val r = DataTester.distributionSimilarity(a, "v", a, "v").collect().head
    assert(r.getAs[Double]("dist_similarity") === 1.0)
  }

  test("distribution similarity: disjoint distributions score 0.0") {
    import spark.implicits._
    val a = Seq(1, 2).toDF("v")
    val b = Seq(3, 4).toDF("v")
    val r = DataTester.distributionSimilarity(a, "v", b, "v").collect().head
    assert(r.getAs[Double]("dist_similarity") === 0.0)
  }

  test("overall confidence weights 0.5/0.3/0.2 and clamps to [0,1]") {
    import spark.implicits._
    val df = Seq((1.0, 1.0, 1.0)).toDF("ri", "tc", "ds")
      .select(DataTester.overallConfidence(col("ri"), col("tc"), col("ds")).as("o"))
    assert(df.head.getDouble(0) === 1.0)
    val half = Seq((0.5, 1.0, 0.0)).toDF("ri", "tc", "ds")
      .select(DataTester.overallConfidence(col("ri"), col("tc"), col("ds")).as("o"))
    assert(math.abs(half.head.getDouble(0) - 0.55) < 1e-12)
  }

  test("confidence adjustment: +0.2 capped at 1.0 on pass, -0.3 floored at 0.1 on fail") {
    import spark.implicits._
    val rels = Seq((0.95, 0.9), (0.6, 0.3)).toDF("confidence", "overall_confidence")
    val out = DataTester.adjustConfidence(rels, DetectionConfig()).collect()
    assert(out(0).getAs[Boolean]("data_validated"))
    assert(out(0).getAs[Double]("adjusted_confidence") === 1.0)
    assert(!out(1).getAs[Boolean]("data_validated"))
    assert(math.abs(out(1).getAs[Double]("adjusted_confidence") - 0.3) < 1e-12)
  }

  test("Cochran sample size: 95%/5% on large population ≈ 385, small population corrected") {
    assert(DataTester.cochranSampleSize(1000000) === 385L)
    assert(DataTester.cochranSampleSize(100) <= 100L)
    assert(DataTester.cochranSampleSize(100) >= 79L) // FPC pulls it near 80
  }

  test("negative fixture shape: low-coverage FK scores below threshold on distribution") {
    import spark.implicits._
    // 2 of 10 target values covered: coverage drags similarity down.
    val src = Seq(1, 1, 2, 2).toDF("v")
    val tgt = (1 to 10).toDF("v")
    val r = DataTester.distributionSimilarity(src, "v", tgt, "v").collect().head
    assert(r.getAs[Double]("dist_similarity") < 0.7)
  }
}
