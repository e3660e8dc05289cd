package org.apache.spark.sql.graftshim

import org.apache.spark.sql.execution.datasources.FileStatusCache

/** Escape hatch for the one maintenance operation that DELETES previously
  * read parquet directories (BatchSink.compact): the session-SHARED
  * FileStatusCache keeps the deleted dirs' leaf-file listings, and the next
  * read of the parent tree would hand those stale paths to the scan and die
  * with FILE_NOT_EXIST. `spark.catalog.refreshByPath` clears only the
  * per-relation tier, not this shared one; invalidating it wholesale is the
  * supported reset (re-listing cost only, no correctness effect). The cache
  * object is `private[sql]`, hence this shim package — same pattern as
  * [[ColumnBridge]].
  */
object FileStatusCacheBridge {
  def clear(): Unit = FileStatusCache.resetForTesting()
}
