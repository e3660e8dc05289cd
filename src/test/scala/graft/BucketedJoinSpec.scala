package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** The co-located join story (ARCHITECTURE "Scale design"): tables written
  * with `bucketBy` on their join key carry a hash-partitioning guarantee
  * in table metadata, so a fact⋈fact join on the bucket key needs NO
  * shuffle of either side — the layout every 100 TB warehouse pre-pays
  * once at write time. This spec proves the engine's tables join
  * shuffle-free when bucketed, and that results are identical to the
  * unbucketed plan.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join runs without a shuffle and matches unbucketed results") {
    val orders = Tables.orders(spark, sf0001)
    val lineitem = Tables.lineitem(spark, sf0001)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").mode("overwrite").saveAsTable("b_lineitem")
    // at test scale the dim side would broadcast (also shuffle-free, but
    // not the layout under test) — force the join to rely on bucketing
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevThreshold = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("qty"))
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin"),
        "expected a sort-merge join over bucketed inputs")
      // the only shuffle is the final aggregate's (o_orderstatus is not the
      // bucket key); the JOIN shuffles neither side — bucket layout
      // satisfies its distribution requirement. Tree + details sections
      // each mention the exchange once.
      assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
        "bucketed join must not shuffle either join input")
      val expected = lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("qty"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val actual = joined.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(actual === expected)
    } finally {
      spark.conf.set(thresholdKey, prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
