package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.Path

class BatchSinkSpec extends SparkSpec {

  private def listVisible(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq.sorted
  }

  test("writeOnce is idempotent: a complete partition is never rewritten") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val dest = s"$base/batch_id=0"
    BatchSink.writeOnce(Seq((1L, "a")).toDF("id", "v"), dest)
    assert(spark.read.parquet(base).count() === 1L)
    // a redelivered batch (different data would be a contract violation,
    // but even then) must not touch the committed partition
    BatchSink.writeOnce(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dest)
    val rows = spark.read.parquet(base).collect()
    assert(rows.length === 1 && rows.head.getLong(0) === 1L)
  }

  test("a torn partial (no _SUCCESS) is healed by the redelivery, not skipped") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val dest = s"$base/batch_id=0"
    // simulate a crash mid-write under the naive layout: data files present,
    // _SUCCESS missing
    BatchSink.writeOnce(Seq((1L, "partial")).toDF("id", "v"), dest)
    val fs = new Path(dest).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dest, "_SUCCESS"), false)
    // SaveMode.Ignore would skip here and permanently undercount; writeOnce
    // rewrites the partition with the redelivered batch
    BatchSink.writeOnce(Seq((7L, "full"), (8L, "full")).toDF("id", "v"), dest)
    val rows = spark.read.parquet(base).collect().map(_.getLong(0)).sorted
    assert(rows.toSeq === Seq(7L, 8L))
    assert(fs.exists(new Path(dest, "_SUCCESS")))
  }

  test("in-flight temp dirs are dot-prefixed — invisible to readers of the tree") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    BatchSink.writeOnce(Seq((1L, "a")).toDF("id", "v"), s"$base/batch_id=0")
    BatchSink.writeOnce(Seq((2L, "b")).toDF("id", "v"), s"$base/batch_id=1")
    // no leftover temp dirs after commit, and names are partition dirs only
    assert(listVisible(base) === Seq("batch_id=0", "batch_id=1"))
    // a stranded temp dir (crash between write and rename) must not be
    // visible to parquet partition discovery
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(base, ".batch_id=2.inprogress"))
    assert(spark.read.parquet(base).count() === 2L)
  }
}
