package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistinctUsersSpec extends SparkSpec {

  test("registers accumulate across batches; re-delivery is a no-op; estimate tracks exact") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val state = s"$base/state"

    // batch 0: users 1..200 in group a
    val b0 = (1 to 200).map(i => ("a", i.toLong)).toDF("g", "u")
    val r0 = DistinctUsers.monitorBatch(b0, "g", "u", state, 0L).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("raw_estimate")).toMap
    assert(math.abs(r0("a") - 200.0) / 200.0 < 0.35, s"estimate ${r0("a")}")

    // batch 1: 100 repeat users + 100 new in a, plus group b
    val b1 = ((101 to 300).map(i => ("a", i.toLong)) ++
      (1 to 50).map(i => ("b", i.toLong))).toDF("g", "u")
    val r1 = DistinctUsers.monitorBatch(b1, "g", "u", state, 1L).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("raw_estimate")).toMap
    assert(math.abs(r1("a") - 300.0) / 300.0 < 0.35, s"estimate ${r1("a")}")
    assert(r1.contains("b"))
    // monotone: merged registers can only grow the estimate
    assert(r1("a") >= r0("a"))

    // re-delivery of batch 1: SaveMode.Ignore skips the partition → identical
    val r1again = DistinctUsers.monitorBatch(b1, "g", "u", state, 1L).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("raw_estimate")).toMap
    assert(r1again === r1)

    // state stays register-bounded: ≤ groups × m rows per batch partition
    val stateRows = spark.read.parquet(s"$state/reg").count()
    assert(stateRows <= 2L * 2L * 64L)
  }

  test("streaming surface writes one exactly-once report per batch") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_hll_s").toString
    val src = s"$base/incoming"
    (1 to 100).map(i => ("a", i.toLong)).toDF("g", "u").write.parquet(src)
    val q = DistinctUsers.stream(
      spark.readStream.schema("g STRING, u BIGINT").parquet(src),
      "g", "u", s"$base/state", s"$base/reports", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val rep = spark.read.parquet(s"$base/reports")
    assert(rep.columns.contains("batch_id"))
    val est = rep.collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("raw_estimate")).toMap
    assert(math.abs(est("a") - 100.0) / 100.0 < 0.35, s"estimate ${est("a")}")
  }
}
