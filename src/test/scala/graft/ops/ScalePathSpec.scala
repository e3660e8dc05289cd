package graft.ops

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.datatest.DataTester
import org.apache.spark.sql.functions._

/** Tests for the 100 TB paths: HLL approximate RI, bucketed co-located
  * joins, and the SQL surface.
  */
class ScalePathSpec extends SparkSpec {

  test("approx RI tracks exact RI within sketch error") {
    val orders = Tables.orders(spark, sf0001)
    val customer = Tables.customer(spark, sf0001)
    val exact = DataTester.referentialIntegrity(orders, "o_custkey", customer, "c_custkey")
      .head.getAs[Double]("ri_ratio")
    val approx = DataTester
      .approxReferentialIntegrity(orders, "o_custkey", customer, "c_custkey")
      .head.getAs[Double]("ri_ratio_approx")
    assert(math.abs(approx - exact) < 0.1, s"approx=$approx exact=$exact")
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val dir = sf0001
    s2.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
    s2.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").mode("overwrite").saveAsTable("lineitem_b")
    val joined = s2.table("lineitem_b")
      .join(s2.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join must not introduce a shuffle on either side
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${plan.take(2000)}")
    assert(joined.count() === Tables.lineitem(s2, dir).count())
  }

  test("SQL surface runs ANSI SQL over registered lake views") {
    val engine = new graft.GraftEngine(spark, sf0001)
    val out = engine.sql(
      """SELECT c_mktsegment, COUNT(*) AS n
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
    assert(out.count() > 0)
    assert(out.columns.toSeq === Seq("c_mktsegment", "n"))
  }
}
