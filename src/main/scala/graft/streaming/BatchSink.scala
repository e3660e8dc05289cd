package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
  *    (written by this sink itself before the rename — NOT dependent on
  *    Spark's committer emitting one); a marker-less directory is a torn
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
    // A batch folded away by compact() no longer has its own directory,
    // but a redelivery of it must STILL be a no-op: the tree's compaction
    // watermark says "batches <= W are incorporated in the consolidated
    // partition". Without this check a redelivered folded batch would see
    // "absent" and re-add its rows — double counting.
    dest.getName match {
      case BatchDirName(id) =>
        if (compactedThrough(fs, dest.getParent).exists(id.toLong <= _)) return
      case _ => ()
    }
    if (fs.exists(dest)) {
      if (fs.exists(new Path(dest, "_SUCCESS"))) return // complete: idempotent skip
      fs.delete(dest, true) // torn write from a crash: heal by rewriting
    }
    val tmp = new Path(dest.getParent, "." + dest.getName + ".inprogress")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // Spark's own _SUCCESS only appears when the committer conf
    // (mapreduce.fileoutputcommitter.marksuccessfuljobs) is on — the
    // default, but an external setting this sink's completeness test must
    // not hinge on: without a marker every committed partition would be
    // judged torn and rewritten on each redelivery. Write our own marker
    // into the temp dir BEFORE the rename, so it is atomically part of the
    // committed partition regardless of deployment conf.
    val marker = new Path(tmp, "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker).close()
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

  private val BatchDirName = """batch_id=(\d+)""".r
  private val WatermarkFile = "_compacted_through"

  /** The tree's compaction watermark: all `batch_id <= W` are incorporated
    * in the consolidated partition. Absent file = never compacted.
    */
  private[streaming] def compactedThrough(fs: FileSystem, tree: Path): Option[Long] = {
    val p = new Path(tree, WatermarkFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        if (s.isEmpty) None else Some(s.toLong)
      } finally in.close()
    }
  }

  /** Fold the tree's `batch_id=0..W` partitions into ONE consolidated
    * partition (at `batch_id=W`), bounding the per-batch file-listing cost
    * that otherwise grows one directory per micro-batch for the life of
    * the stream. The monitors' additive count states make this a pure
    * re-aggregation: groupBy `keyCols`, sum each of `sumCols` — cumulative
    * reads over the compacted tree return identical totals.
    *
    * Only a gap-free complete prefix folds: W = max id such that every
    * `batch_id <= W` holds `_SUCCESS`. A torn partial (crash mid-write)
    * caps W below it — folding past it would either lose its healed rows
    * (redelivery skipped by the watermark) or double them.
    *
    * Crash-safe and resumable, same discipline as [[writeOnce]]:
    *  1. consolidated totals → hidden temp dir (+ `_compact_id` recording
    *     W, `_SUCCESS` last);
    *  2. watermark file `_compacted_through` = W (redeliveries of folded
    *     batches now skip; all folded dirs still present, so this is
    *     redundant-safe);
    *  3. delete `batch_id<=W` dirs; rename temp → `batch_id=W`.
    * A crash inside 3 leaves the temp complete; re-running compact()
    * detects it (temp `_SUCCESS` + `_compact_id`) and resumes at 3 without
    * re-reading a half-deleted tree.
    *
    * NOT concurrency-safe with an in-flight monitor batch on the same
    * tree: run between micro-batches (e.g. inside foreachBatch every N
    * batches) or as offline maintenance.
    *
    * Returns the new watermark, or -1 if there was nothing to fold
    * (fewer than `minBatches` complete prefix partitions).
    */
  /** Complete a compaction swap (steps 2–3 of [[compact]]'s protocol):
    * publish the watermark, drop the folded dirs, move the consolidated
    * temp into place. Idempotent — every sub-step tolerates having already
    * happened (a re-run after a crash at any point inside finishes the
    * remainder).
    */
  private def finishSwap(fs: FileSystem, tree: Path, tmp: Path, w: Long): Long = {
    // 2. publish the watermark first: every folded dir is still present,
    // so redeliveries skip either way, and a crash after this point
    // leaves a resumable state instead of a double-counting one
    val wmTmp = new Path(tree, "." + WatermarkFile + ".tmp")
    if (fs.exists(wmTmp)) fs.delete(wmTmp, false)
    val out = fs.create(wmTmp)
    try out.write(w.toString.getBytes("UTF-8")) finally out.close()
    val wm = new Path(tree, WatermarkFile)
    if (fs.exists(wm)) fs.delete(wm, false)
    fs.rename(wmTmp, wm)
    // 3. drop the folded dirs and move the consolidated totals in
    fs.listStatus(tree).foreach { st =>
      st.getPath.getName match {
        case BatchDirName(id) if id.toLong <= w => fs.delete(st.getPath, true)
        case _ => ()
      }
    }
    fs.rename(tmp, new Path(tree, s"batch_id=$w"))
    // the deleted dirs' leaf files may sit in the session-shared
    // FileStatusCache (a later read of the tree would list them and die
    // on FILE_NOT_EXIST); refreshByPath does not clear the shared tier
    org.apache.spark.sql.graftshim.FileStatusCacheBridge.clear()
    w
  }

  /** If a previous [[compact]] crashed mid-swap (consolidated temp is
    * complete but folded dirs are half-deleted / the rename never ran),
    * finish the swap now. MUST be called before any cumulative read of a
    * compactable tree: after such a crash the visible partitions are
    * missing folded data until the swap completes, and a monitor that read
    * the half-swapped tree would persist wrong totals exactly-once. No-op
    * (one existence check) when nothing is pending.
    */
  def healPending(spark: SparkSession, treeDir: String): Unit = {
    val tree = new Path(treeDir)
    val fs = tree.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tree)) return
    val tmp = new Path(tree, ".compact.inprogress")
    if (fs.exists(new Path(tmp, "_SUCCESS")) && fs.exists(new Path(tmp, "_compact_id"))) {
      val in = fs.open(new Path(tmp, "_compact_id"))
      val w = try scala.io.Source.fromInputStream(in).mkString.trim.toLong finally in.close()
      finishSwap(fs, tree, tmp, w)
    }
  }

  def compact(
      spark: SparkSession,
      treeDir: String,
      keyCols: Seq[String],
      sumCols: Seq[String],
      minBatches: Int = 2): Long = {
    require(keyCols.nonEmpty || sumCols.nonEmpty,
      "compact needs key columns (distinct-set state) or additive columns")
    val tree = new Path(treeDir)
    val fs = tree.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tree)) return -1L
    val tmp = new Path(tree, ".compact.inprogress")

    // resume a crash that happened mid-swap
    if (fs.exists(new Path(tmp, "_SUCCESS")) && fs.exists(new Path(tmp, "_compact_id"))) {
      val in = fs.open(new Path(tmp, "_compact_id"))
      val w = try scala.io.Source.fromInputStream(in).mkString.trim.toLong finally in.close()
      return finishSwap(fs, tree, tmp, w)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true) // torn temp from an earlier crash

    val ids = fs.listStatus(tree).toSeq.map(_.getPath.getName).collect {
      case BatchDirName(id) => id.toLong
    }.sorted
    // fold only a CONTIGUOUS complete prefix: an id gap means a batch is
    // still in flight (its writeOnce hasn't landed) — setting the
    // watermark past it would make its eventual delivery skip, losing it
    val complete = ids.zipWithIndex.takeWhile { case (id, i) =>
      id == ids.head + i && fs.exists(new Path(tree, s"batch_id=$id/_SUCCESS"))
    }.map(_._1)
    if (complete.size < minBatches) return -1L
    val w = complete.last

    // 1. consolidated totals from EXACTLY the complete prefix dirs (explicit
    // paths — never a half-trusted whole-tree read)
    val parts = complete.map(id => s"$treeDir/batch_id=$id")
    val grouped = spark.read.parquet(parts: _*)
    val sums = sumCols.map(c =>
      org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col(c))
        .cast("long").as(c))
    // no additive columns = distinct-set state (e.g. a candidate-key
    // tree): folding is a distinct union over the keys
    val folded =
      if (sumCols.isEmpty) grouped.select(keyCols.head, keyCols.tail: _*).distinct()
      else if (keyCols.isEmpty) grouped.agg(sums.head, sums.tail: _*)
      else grouped.groupBy(keyCols.head, keyCols.tail: _*).agg(sums.head, sums.tail: _*)
    folded.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val idOut = fs.create(new Path(tmp, "_compact_id"))
    try idOut.write(w.toString.getBytes("UTF-8")) finally idOut.close()
    val marker = new Path(tmp, "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker).close()
    finishSwap(fs, tree, tmp, w)
  }
}
