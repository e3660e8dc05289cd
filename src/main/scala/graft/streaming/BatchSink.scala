package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Exactly-once per-batch partition writes under foreachBatch's
  * at-least-once contract.
  *
  * The naive layout (`df.write.mode(Ignore).parquet(dir/batch_id=N)`) is
  * idempotent only if each write is ATOMIC: a crash mid-write leaves a
  * partial `batch_id=N` directory that a redelivered batch then finds
  * "present" and skips, permanently losing part of that batch's rows from
  * every cumulative aggregate over the tree.
  *
  * [[writeOnce]] closes that gap with the standard commit protocol:
  *  - a batch directory counts as PRESENT only if it holds `_SUCCESS`
  *    (Spark's own job-commit marker); a marker-less directory is a torn
  *    write and is deleted and rewritten,
  *  - the data is first written to a dot-prefixed sibling temp directory
  *    (invisible to parquet partition discovery, so concurrent readers of
  *    the tree never see in-flight rows), then renamed into place — one
  *    atomic filesystem operation on HDFS and local FS.
  *
  * Readers of the tree need no change: hidden temp dirs are filtered by
  * Spark's file index, and complete partitions are exactly the visible ones.
  */
object BatchSink {

  /** Write `df` as the partition directory `destDir` exactly once.
    * Re-invocations with the partition already complete are no-ops, torn
    * partials are healed, and a lost rename race (another attempt committed
    * first) discards this attempt's temp output.
    */
  def writeOnce(df: DataFrame, destDir: String): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(conf)
    if (fs.exists(dest)) {
      if (fs.exists(new Path(dest, "_SUCCESS"))) return // complete: idempotent skip
      fs.delete(dest, true) // torn write from a crash: heal by rewriting
    }
    val tmp = new Path(dest.getParent, "." + dest.getName + ".inprogress")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // Hadoop rename(tmp, dest) with dest ALREADY a directory does not fail
    // — it moves tmp INSIDE dest (as dest/.….inprogress) and returns true,
    // which would strand this attempt's duplicate data inside the winner's
    // committed partition. So: only rename into an absent dest, and treat
    // both a refused rename and a swallowed rename as a lost race whose
    // temp output must be discarded.
    if (fs.exists(dest) || !fs.rename(tmp, dest)) {
      fs.delete(tmp, true) // race lost before rename: other writer won
    } else {
      val swallowed = new Path(dest, tmp.getName)
      if (fs.exists(swallowed)) fs.delete(swallowed, true) // nested by a lost race
    }
  }
}
