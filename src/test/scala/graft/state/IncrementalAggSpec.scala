package graft.state

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("g")

  test("merge(state, partial(batch)) == partial(history ∪ batch), exactly") {
    val history = (1 to 800).map(i => (s"g${i % 5}", i * 0.1)).toDF("g", "v")
    val batch = (801 to 1000).map(i => (s"g${i % 5}", i * 0.1)).toDF("g", "v")
    val incremental = IncrementalAgg.merge(keys,
      IncrementalAgg.partial(history, keys, "v"),
      IncrementalAgg.partial(batch, keys, "v"))
    val full = IncrementalAgg.partial(history.union(batch), keys, "v")
    val i = incremental.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    val f = full.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    assert(i === f)
  }

  test("merge is order-insensitive and closed under re-merge") {
    val parts = (0 until 4).map { p =>
      IncrementalAgg.partial(
        (1 to 250).map(i => (s"g${i % 3}", (p * 250 + i) * 0.5)).toDF("g", "v"),
        keys, "v")
    }
    val ab = IncrementalAgg.merge(keys, parts(0), parts(1))
    val cd = IncrementalAgg.merge(keys, parts(2), parts(3))
    val nested = IncrementalAgg.merge(keys, ab, cd)
    val flat = IncrementalAgg.merge(keys, parts.reverse: _*)
    val n = nested.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    val f = flat.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    assert(n === f)
    assert(nested.schema === parts(0).schema)
  }

  test("report derives mean from cnt+sum at read time") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)).toDF("g", "v")
    val rep = IncrementalAgg.report(IncrementalAgg.partial(df, keys, "v"), keys)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rep("a") === ((2L, 3.0, 1.5)))
    assert(rep("b") === ((1L, 10.0, 10.0)))
  }
}
