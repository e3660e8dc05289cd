package graft.ops

import graft.SparkSpec

class CdcSpec extends SparkSpec {

  test("latestSnapshot: latest-wins, trailing delete drops key, mid-log delete does not") {
    import spark.implicits._
    val log = Seq(
      // key 1: U then U — latest value wins
      (1L, 10L, 1L, "U", 1.0),
      (1L, 20L, 2L, "U", 2.0),
      // key 2: U then D — deleted, absent from snapshot
      (2L, 10L, 3L, "U", 3.0),
      (2L, 20L, 4L, "D", 0.0),
      // key 3: D mid-log then U — alive with the later value
      (3L, 10L, 5L, "D", 0.0),
      (3L, 20L, 6L, "U", 6.0),
      // key 4: same ts — seq breaks the tie, higher seq wins
      (4L, 10L, 7L, "U", 7.0),
      (4L, 10L, 8L, "U", 8.0)
    ).toDF("k", "ts", "seq", "op", "v")
    val out = Cdc.latestSnapshot(log, "k", "ts", "seq", "op", Seq("v")).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Double]("v"), r.getAs[Long]("last_ts"), r.getAs[Long]("n_ops")))).toMap
    assert(out === Map(
      1L -> ((2.0, 20L, 2L)),
      3L -> ((6.0, 20L, 2L)),
      4L -> ((8.0, 10L, 2L))))
  }
}
