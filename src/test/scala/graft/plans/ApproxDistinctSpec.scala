package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxDistinctSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("count(DISTINCT) rewrites to HLL sketch when enabled and input is big") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val exact = orders.agg(countDistinct(col("o_custkey")).as("n")).head.getLong(0)
    withConf(
      "spark.graft.approxDistinct.enabled" -> "true",
      "spark.graft.approxDistinct.minInputBytes" -> "0") {
      val df = orders.agg(countDistinct(col("o_custkey")).as("n"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"expected HLL rewrite in optimized plan:\n$plan")
      val approx = df.head.getLong(0)
      // rsd 0.023 → well within 10% on 1k-ish distinct keys
      assert(math.abs(approx - exact).toDouble / exact < 0.1,
        s"approx=$approx exact=$exact")
      // column name unchanged by the rewrite
      assert(df.columns.toSeq === Seq("n"))
    }
  }

  test("rewrite respects the size threshold and the enable flag") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    def planOf() =
      orders.agg(countDistinct(col("o_custkey"))).queryExecution.optimizedPlan.toString
    // disabled → exact
    assert(!planOf().contains("approx_count_distinct"))
    // enabled but threshold far above input size → exact
    withConf(
      "spark.graft.approxDistinct.enabled" -> "true",
      "spark.graft.approxDistinct.minInputBytes" -> (1L << 40).toString) {
      assert(!planOf().contains("approx_count_distinct"))
    }
  }

  test("graft_dot is callable from SQL through the extension") {
    import spark.implicits._
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM vecs").head.getDouble(0)
    assert(r === 11.0)
  }
}
