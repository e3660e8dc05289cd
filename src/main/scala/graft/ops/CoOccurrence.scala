package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise co-occurrence mining (frequent itemsets, k = 2): which items
  * appear together in the same basket, with support counts — the
  * market-basket primitive behind "files changed together" /
  * "parts ordered together" analyses.
  *
  * The pair join is an equi-join of the (basket, item) table with itself
  * on the basket key with `item_a < item_b` — each unordered pair per
  * basket counted once, duplicate (basket, item) rows collapsed first so
  * quantity lines don't inflate support. Scale: the join keys on basket
  * id (cardinality grows with data); a basket of n items emits n(n−1)/2
  * pairs, so `maxBasketSize` drops pathological baskets (one 10⁶-item
  * basket would emit 5·10¹¹ pairs — at 100 TB that cap is the difference
  * between a plan and an outage; dropped baskets are counted in the
  * companion [[basketStats]]).
  */
object CoOccurrence {

  /** (item_a, item_b, support) for pairs with support ≥ `minSupport`,
    * over baskets of at most `maxBasketSize` distinct items.
    */
  def pairs(
      df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketSize: Int = 1000): DataFrame = {
    val items = df
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("item").isNotNull && col("basket").isNotNull)
      .distinct()
    val sized = items
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("basket")))
      .filter(col("bsize") <= maxBasketSize)
    val l = sized.select(col("basket"), col("item").as("item_a"))
    val r = sized.select(col("basket"), col("item").as("item_b"))
    l.join(r, Seq("basket"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Per-corpus basket-size profile: baskets, max/mean size, and how many
    * the `maxBasketSize` cap would drop — the preflight for [[pairs]].
    */
  def basketStats(
      df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int = 1000): DataFrame =
    df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("item").isNotNull && col("basket").isNotNull)
      .distinct()
      .groupBy("basket").agg(count(lit(1)).as("bsize"))
      .agg(
        count(lit(1)).as("n_baskets"),
        max(col("bsize")).as("max_basket"),
        sum(col("bsize")).cast("long").as("n_items_total"),
        sum(when(col("bsize") > maxBasketSize, 1L).otherwise(0L))
          .cast("long").as("n_dropped"))
}
