package graft.ext

import org.apache.spark.sql.{Column, DataFrame}

/** Input-parallelism guard for expensive per-row passes (guide §2.5,
  * "input skew: one huge unsplittable file").
  *
  * A parquet file is splittable only at row-group boundaries, so a small
  * table written as one row group arrives as ONE scan partition — and any
  * costly map work stacked on the scan (shingling, minhash, per-asset codec
  * walks, quality metrics) runs serially on one core while the rest idle.
  * At 100 TB the same scan arrives as thousands of splits and needs no
  * help.
  *
  * `byKey` therefore repartitions by a stable key ONLY when the scan's
  * split count is well under the session's parallelism — a no-op at
  * cluster scale (no extra shuffle), a one-bounce text-sized shuffle
  * locally. Hash-by-key (not round-robin) keeps the assignment
  * deterministic under task retry (SPARK-38388 class of bugs) and skips
  * round-robin's sort-before-repartition.
  */
object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val sc = df.sparkSession.sparkContext
    // physical split count of the frame as planned (no job is run)
    val parts = df.rdd.getNumPartitions
    if (parts * 2 <= sc.defaultParallelism) df.repartition(key) else df
  }
}
