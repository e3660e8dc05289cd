package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topK equals the row_number window formulation on random data") {
    val rnd = new Random(42)
    val rows = (1 to 5000).map { i =>
      (s"g${rnd.nextInt(17)}", rnd.nextInt(50).toLong, i.toLong)
    }
    val df = rows.toDF("g", "score", "id") // heavy score ties exercise tiebreak
    val k = 7

    val viaAgg = df
      .groupBy("g")
      .agg(TopKAgg.topK(k)(col("score"), col("id")).as("tk"))
      .select(col("g"), posexplode(col("tk.items")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("col.score").as("score"), col("col.id").as("id"))

    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("g"), col("rk").cast("int"), col("score"), col("id"))

    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
    assert(viaAgg.count() === viaWindow.count())
  }

  test("buffer merge is order-insensitive and k-bounded") {
    val agg = TopKAgg.TopK(3)
    val items = Seq(5L -> 1L, 5L -> 2L, 9L -> 3L, 1L -> 4L, 9L -> 5L, 7L -> 6L)
      .map { case (s, i) => TopKAgg.In(s, i) }
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    // every 2-way split merges to the same buffer
    for (cut <- 0 to items.length) {
      val (a, b) = items.splitAt(cut)
      val m = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(m === whole)
    }
    assert(whole.items === Seq(TopKAgg.In(9, 3), TopKAgg.In(9, 5), TopKAgg.In(7, 6)))
  }

  test("plan is a partial hash aggregate — no sort, no window exchange-sort") {
    val df = (1 to 100).map(i => (s"g${i % 5}", i.toLong, i.toLong)).toDF("g", "score", "id")
    val plan = df.groupBy("g").agg(TopKAgg.topK(3)(col("score"), col("id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_"), plan) // map-side combine: ≤k rows/group/partition shipped
    assert(!plan.contains("Window"), plan)
  }
}
