package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training documents
  * that share word n-grams with a held-out benchmark/eval set — the standard
  * leakage check run before training (n-gram overlap against eval suites).
  *
  * Scale design: the benchmark side is distinct-hashed and BROADCAST — eval
  * suites are tiny (thousands of documents) next to a 100 TB corpus, so the
  * candidate side streams map-side through a broadcast hash join with no
  * shuffle of the corpus at all. Per-document gram arrays are built by
  * codegen'd array expressions (no UDFs); only (doc_id, gram_hash) longs
  * ever leave the scan, never text. If the benchmark outgrows broadcast,
  * drop `broadcast()` and the same plan degrades to a hash-partitioned
  * semi-join keyed by gram hash (unbounded key cardinality).
  */
object Decontaminate {

  /** Distinct word n-gram stable hashes (md5-prefix, oracle-portable; see
    * Dedup.stableHash). Documents shorter than n hash as one whole-text
    * gram — Dedup.shingles' convention, so a short benchmark doc still
    * matches its verbatim copy.
    */
  def gramHashes(text: Column, n: Int, seed: Int = 7, portable: Boolean = true): Column =
    transform(Dedup.shingles(text, n), g => Dedup.stableHash(g, seed, portable))

  /** One row per candidate document: n_grams (distinct), n_contaminated
    * (grams also present anywhere in the benchmark), contamination ratio,
    * and a keep/drop flag at `threshold`.
    */
  def contamination(
      candidates: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.2,
      seed: Int = 7,
      portable: Boolean = true): DataFrame = {
    val cand = candidates.select(
      col(idCol), gramHashes(col(textCol), n, seed, portable).as("__grams"))
    val bench = benchmark
      .select(explode(gramHashes(col(textCol), n, seed, portable)).as("gh"))
      .distinct()
    val hits = cand
      .select(col(idCol), explode(col("__grams")).as("gh"))
      .join(broadcast(bench), "gh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated"))
    val ratio = when(col("n_grams") === 0, lit(0.0))
      .otherwise(col("n_contaminated").cast("double") / col("n_grams").cast("double"))
    cand
      .select(col(idCol), size(col("__grams")).cast("long").as("n_grams"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .select(col(idCol), col("n_grams"), col("n_contaminated"),
        ratio.as("contamination"),
        (ratio >= threshold).as("contaminated"))
  }
}
