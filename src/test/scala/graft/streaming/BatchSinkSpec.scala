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

  test("completeness marker is the sink's own — survives a disabled committer marker conf") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val prev = conf.get(key)
    conf.set(key, "false") // deployment that disables Spark's _SUCCESS
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
      val dest = s"$base/batch_id=0"
      BatchSink.writeOnce(Seq((1L, "a")).toDF("id", "v"), dest)
      val fs = new Path(dest).getFileSystem(conf)
      // the sink wrote its own marker, so the partition counts as complete...
      assert(fs.exists(new Path(dest, "_SUCCESS")))
      // ...and a redelivery is an idempotent skip, not a delete+rewrite
      BatchSink.writeOnce(Seq((9L, "dup")).toDF("id", "v"), dest)
      val rows = spark.read.parquet(base).collect()
      assert(rows.length === 1 && rows.head.getLong(0) === 1L)
    } finally {
      if (prev == null) conf.unset(key) else conf.set(key, prev)
    }
  }

  test("compact folds a complete prefix, preserves totals, and caps at a gap or torn dir") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    // batches 0..3 complete, 4 missing (in flight), 5 complete
    Seq(0, 1, 2, 3, 5).foreach { i =>
      BatchSink.writeOnce(
        Seq(("k1", 1L * (i + 1)), ("k2", 10L)).toDF("key", "n"),
        s"$base/batch_id=$i")
    }
    val before = spark.read.parquet(base)
      .groupBy("key").agg(org.apache.spark.sql.functions.sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    // gap at 4 caps the fold at 3 — folding past an in-flight batch would
    // lose it to the watermark
    assert(BatchSink.compact(spark, base, Seq("key"), Seq("n")) === 3L)
    val dirs = new java.io.File(base).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted
    assert(dirs.toSeq === Seq("batch_id=3", "batch_id=5"))
    val after = spark.read.parquet(base)
      .groupBy("key").agg(org.apache.spark.sql.functions.sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(after === before)
    // redelivery of a folded batch: watermark makes it a no-op
    BatchSink.writeOnce(Seq(("k1", 999L)).toDF("key", "n"), s"$base/batch_id=1")
    assert(!new java.io.File(s"$base/batch_id=1").exists())
    // nothing left to fold below the next complete prefix of >= 2
    assert(BatchSink.compact(spark, base, Seq("key"), Seq("n")) === -1L)
  }

  test("compact resumes a crash between watermark publish and the swap") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    (0 to 2).foreach { i =>
      BatchSink.writeOnce(Seq(("k", 5L)).toDF("key", "n"), s"$base/batch_id=$i")
    }
    // simulate the crash state: consolidated temp complete, dirs not yet swapped
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(("k", 15L)).toDF("key", "n").write.parquet(s"$base/.compact.inprogress")
    val idOut = fs.create(new Path(s"$base/.compact.inprogress/_compact_id"))
    idOut.write("2".getBytes("UTF-8")); idOut.close()
    assert(BatchSink.compact(spark, base, Seq("key"), Seq("n")) === 2L)
    val rows = spark.read.parquet(base).collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("n") === 15L)
    assert(!fs.exists(new Path(s"$base/.compact.inprogress")))
  }

  test("healPending finishes a crash inside the delete/rename step before any read") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    (0 to 2).foreach { i =>
      BatchSink.writeOnce(Seq(("k", 5L)).toDF("key", "n"), s"$base/batch_id=$i")
    }
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash state INSIDE step 3: watermark published, consolidated temp
    // complete, folded dirs HALF-deleted, rename never ran — the visible
    // tree is missing batches 0..1 and a naive cumulative read returns 5
    Seq(("k", 15L)).toDF("key", "n").write.parquet(s"$base/.compact.inprogress")
    val idOut = fs.create(new Path(s"$base/.compact.inprogress/_compact_id"))
    idOut.write("2".getBytes("UTF-8")); idOut.close()
    val wmOut = fs.create(new Path(s"$base/_compacted_through"))
    wmOut.write("2".getBytes("UTF-8")); wmOut.close()
    fs.delete(new Path(s"$base/batch_id=0"), true)
    fs.delete(new Path(s"$base/batch_id=1"), true)
    org.apache.spark.sql.graftshim.FileStatusCacheBridge.clear()
    // the monitors' read-path guard completes the swap
    BatchSink.healPending(spark, base)
    val rows = spark.read.parquet(base).collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("n") === 15L)
    assert(!fs.exists(new Path(s"$base/.compact.inprogress")))
    // healed tree is exactly the consolidated partition
    assert(listVisible(base).filter(_.startsWith("batch_id=")) === Seq("batch_id=2"))
    // and with nothing pending the guard is a no-op
    BatchSink.healPending(spark, base)
    assert(spark.read.parquet(base).collect().head.getAs[Long]("n") === 15L)
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
