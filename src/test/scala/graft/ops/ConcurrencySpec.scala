package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ConcurrencySpec extends SparkSpec {

  test("peakConcurrency: hand-checked peak, half-open touch does not overlap") {
    import spark.implicits._
    // k=a: [0,10) [5,20) [10,30) — at t=10 the first interval has closed
    // (half-open), so the peak is 2, first reached at t=5.
    // k=b: [0,10) and [10,20) touch — never concurrent, peak 1 at t=0.
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 10L, 30L),
      ("b", 0L, 10L), ("b", 10L, 20L)
    ).toDF("k", "s", "e")
    val got = Concurrency.peakConcurrency(iv, "k", "s", "e", bucketUs = 7L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") === ((3L, 2L, 5L)))
    assert(got("b") === ((2L, 1L, 0L)))
  }

  test("peakConcurrency: bucketed sweep equals single-window naive sweep") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val iv = (1 to 400).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s"k${i % 3}", s, s + 1 + rnd.nextInt(200).toLong)
    }.toDF("k", "s", "e")

    val ev = iv.select(col("k"), col("s").as("t"), lit(1L).as("d"))
      .unionByName(iv.select(col("k"), col("e").as("t"), lit(-1L).as("d")))
    val w = Window.partitionBy("k").orderBy(col("t").asc, col("d").asc)
    val rs = ev.withColumn("rs", sum(col("d")).over(w))
      .withColumn("mx", max(col("rs")).over(Window.partitionBy("k")))
    val naive = rs.groupBy("k").agg(
      max(col("rs")).as("peak"),
      min(when(col("rs") === col("mx"), col("t"))).as("peak_t"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // tiny bucket width forces many bucket crossings and carry-ins
    val got = Concurrency.peakConcurrency(iv, "k", "s", "e", bucketUs = 37L)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === naive)
  }
}
