package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-based data selection — pick the raw-corpus documents that
  * look most like a small TARGET domain, the DSIR recipe (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023, public) re-expressed log-free so the scores are
  * integer-exact and engine-portable:
  *
  *  1. hash every word into one of `nBuckets` feature buckets
  *     ([[Dedup.stableHash]] — the same md5-prefix hash the oracle can
  *     replay);
  *  2. count bucket occurrences over the target (`t_f`) and the raw
  *     corpus (`r_f`);
  *  3. weight each bucket by the add-one-smoothed frequency ratio in
  *     fixed point: `w_f = floor(scale·(t_f+1) / (r_f+1))` — all-integer
  *     ([[ExactMath.floorDiv]]; DuckDB `//` is its twin), no `log`
  *     (libm last-ulp drift is exactly what a cross-engine hash check
  *     cannot tolerate);
  *  4. score a document by the weight-sum over its word occurrences and
  *     keep the deterministic top-k (score desc, id asc).
  *
  * The variant ranks by Σ n_f·w_f (a linear-ratio score) where DSIR ranks
  * by Σ n_f·log(t_f/r_f); both order documents by how over-represented
  * their features are in the target. Documented as a deliberate deviation,
  * not an approximation bug.
  *
  * Scale: the weight table is bounded by `nBuckets` (rows, not data) —
  * broadcast; scoring is explode → broadcast-join → one hash-groupBy on
  * the id (a single data-scale shuffle of (id, long) pairs). The two
  * count passes are map-side-combining aggregates on the bucket id.
  */
object Importance {

  private val BucketSeed = 7

  def bucket(word: Column, nBuckets: Int): Column =
    pmod(Dedup.stableHash(word, BucketSeed), lit(nBuckets.toLong))

  /** Per-bucket fixed-point importance weights from a target/raw corpus
    * split. Output: (bucket, t_f, r_f, w) — `nBuckets` rows at most.
    */
  def featureWeights(
      target: DataFrame, raw: DataFrame, textCol: String = "text",
      nBuckets: Int = 64, scale: Long = 1L << 20): DataFrame = {
    def counts(df: DataFrame, out: String) = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(bucket(col("w"), nBuckets).as("bucket"))
      .agg(count(lit(1)).as(out))
    counts(target, "t_f")
      .join(counts(raw, "r_f"), Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("t_f"), lit(0L)).as("t_f"),
        coalesce(col("r_f"), lit(0L)).as("r_f"))
      .withColumn("w", ExactMath.floorDiv(
        (col("t_f") + 1L) * lit(scale), col("r_f") + 1L))
  }

  /** Deterministic top-`k` raw documents by target-likeness. Output:
    * (id, n_tokens, score) — `score` the integer weight-sum.
    */
  def select(
      raw: DataFrame, weights: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", nBuckets: Int = 64, k: Int = 50): DataFrame =
    raw
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .withColumn("bucket", bucket(col("word"), nBuckets))
      .join(broadcast(weights.select("bucket", "w")), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** One-call wiring: split `docs` into target (`isTarget`) and raw rows,
    * learn weights on the split, return the top-k raw documents.
    */
  def importanceSelect(
      docs: DataFrame, isTarget: Column, textCol: String = "text",
      idCol: String = "doc_id", nBuckets: Int = 64, k: Int = 50): DataFrame = {
    val target = docs.filter(isTarget)
    val raw = docs.filter(!isTarget)
    select(raw, featureWeights(target, raw, textCol, nBuckets),
      textCol, idCol, nBuckets, k)
  }
}
