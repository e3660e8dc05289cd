package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

/** transformWithState schema evolution (TwsEvolve): a v2 processor with
  * an ADDED state field resumes a v1 RocksDB checkpoint under the Avro
  * encoding — counts and sums carry over, the new field reads as the
  * honest unknown for pre-evolution keys — while the default unsaferow
  * encoding rejects the same restart visibly.
  */
class TwsEvolveSpec extends SparkSpec {

  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  // sink choice: foreachBatch — memory sinks refuse checkpoint recovery
  // and the file sink refuses Update mode; results land in driver maps

  test("Avro encoding: v2 state schema resumes a v1 checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_evolve_avro").toString + "/ckpt"
    val source = MemoryStream[(Long, Long)]
    val df = source.toDF().toDF("user_id", "v")

    val out1 = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val q1 = StateBackend.using(spark, StateBackend.RocksDb) {
      StateBackend.usingAvro(spark) {
        TwsEvolve.aggV1(spark, df).writeStream
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Update)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.collect().foreach(r => out1.synchronized {
              out1(r.getAs[Long]("userId")) =
                (r.getAs[Long]("n"), r.getAs[Long]("sum"))
            })
          }.start()
      }
    }
    try {
      source.addData((1L, 10L), (1L, 20L), (2L, 5L))
      q1.processAllAvailable()
      assert(out1.toMap === Map(1L -> ((2L, 30L)), 2L -> ((1L, 5L))))
    } finally q1.stop()

    // second incarnation: SAME checkpoint, EVOLVED state schema. The
    // encoding was pinned at first start, so no conf scope is needed —
    // proving the checkpoint itself carries the choice.
    val out2 = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long, Boolean)]
    val q2 = StateBackend.using(spark, StateBackend.RocksDb) {
      TwsEvolve.aggV2(spark, df).writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => out2.synchronized {
            out2(r.getAs[Long]("userId")) =
              (r.getAs[Long]("n"), r.getAs[Long]("sum"),
                r.getAs[Long]("maxV"), r.getAs[Boolean]("maxKnown"))
          })
        }.start()
    }
    try {
      source.addData((1L, 7L), (3L, 100L))
      q2.processAllAvailable()
      // user 1: v1 state (n=2, sum=30) carried through the evolution,
      // the new max starts from the first POST-evolution row
      assert(out2(1L) === ((3L, 37L, 7L, true)),
        "pre-evolution counts/sums must survive the schema change")
      // user 3: fresh key, fully known
      assert(out2(3L) === ((1L, 100L, 100L, true)))
      val rocks = q2.recentProgress.flatMap(_.stateOperators).exists(
        _.customMetrics.containsKey("rocksdbGetCount"))
      assert(rocks, "the evolved incarnation did not run on RocksDB")
    } finally q2.stop()
  }

  test("unsaferow encoding rejects the same evolution visibly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_evolve_usr").toString + "/ckpt"
    val source = MemoryStream[(Long, Long)]
    val df = source.toDF().toDF("user_id", "v")
    // v1 under the DEFAULT (unsaferow) encoding
    val q1 = StateBackend.using(spark, StateBackend.RocksDb) {
      TwsEvolve.aggV1(spark, df).writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect(); () }
        .start()
    }
    try {
      source.addData((1L, 10L))
      q1.processAllAvailable()
    } finally q1.stop()
    // the v2 restart must FAIL — byte-layout state cannot evolve
    val q2 = StateBackend.using(spark, StateBackend.RocksDb) {
      TwsEvolve.aggV2(spark, df).writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect(); () }
        .start()
    }
    try {
      source.addData((1L, 7L))
      val e = intercept[Exception] { q2.processAllAvailable() }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(e).exists(t => t.getMessage != null &&
        (t.getMessage.contains("SCHEMA_NOT_COMPATIBLE") ||
          t.getMessage.contains("does not match existing"))),
        s"expected a state-schema incompatibility, got: $e")
    } finally q2.stop()
  }
}
