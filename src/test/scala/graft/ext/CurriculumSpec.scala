package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {

  test("equi-depth buckets: ~equal sizes, ordered by score, ties share a bucket") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, (i % 100).toDouble)).toDF("id", "score")
    val out = Curriculum.equiDepthBuckets(df, "score", numBuckets = 10)
    val sizes = out.groupBy("bucket").count().collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet === (0L to 9L).toSet)
    sizes.values.foreach(n => assert(n === 100L)) // 100 distinct scores × 10 each
    // monotone: max score of bucket b ≤ min score of bucket b+1
    val ranges = out.groupBy("bucket")
      .agg(min("score").as("lo"), max("score").as("hi"))
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Double]("lo"), r.getAs[Double]("hi")))
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
    // ties: every row of one score lands in exactly one bucket
    val perScore = out.groupBy("score").agg(countDistinct("bucket").as("nb"))
      .agg(max("nb")).collect().head.getLong(0)
    assert(perScore === 1L)
  }

  test("skewed scores: a dominant value fills adjacent buckets deterministically") {
    import spark.implicits._
    // 900 rows of score 5.0 + 100 spread rows → the 5.0 block must sit in ONE bucket
    val df = ((1 to 900).map(i => (i.toLong, 5.0)) ++
      (1 to 100).map(i => (900L + i, i.toDouble * 10))).toDF("id", "score")
    val out = Curriculum.equiDepthBuckets(df, "score", numBuckets = 4)
    val fiveBuckets = out.filter(col("score") === 5.0)
      .select("bucket").distinct().collect()
    assert(fiveBuckets.length === 1)
    assert(fiveBuckets.head.getAs[Long]("bucket") === 0L) // nothing precedes 5.0
  }

  test("gateCostSweep: exact kept docs/weight at each decile threshold") {
    import spark.implicits._
    // scores 1..100, weight = score (so kept_weight is a closed form)
    val df = (1L to 100L).map(i => (i, i)).toDF("s", "w")
    val out = Curriculum.gateCostSweep(df, "s", "w").collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(out.keySet === (0L to 9L).toSet)
    // bucket d: threshold = 10d+1, kept docs = 100 − 10d,
    // kept weight = Σ_{10d+1..100} = (100·101 − 10d·(10d+1))/2
    (0 to 9).foreach { d =>
      val r = out(d.toLong)
      assert(r.getAs[Long]("threshold") === 10L * d + 1L)
      assert(r.getAs[Long]("kept_docs") === 100L - 10L * d)
      val kw = (100L * 101L - (10L * d) * (10L * d + 1L)) / 2L
      assert(r.getAs[Long]("kept_weight") === kw)
      assert(r.getAs[Long]("kept_docs_fp") === (100L - 10L * d) * 1048576L / 100L)
      assert(r.getAs[Long]("kept_weight_fp") === kw * 1048576L / 5050L)
    }
  }
}
