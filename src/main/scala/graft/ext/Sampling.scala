package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus sampling for training-data pipelines (north-star extension).
  *
  * `sample(fraction)` / `sampleBy` are per-partition Bernoulli filters — no
  * shuffle, no skew, uniform across the dataset — which is why the engine
  * uses them everywhere the reference used `LIMIT n` (a LIMIT reads one
  * partition's head: at 100 TB that is whatever file happened to sort
  * first, not a sample).
  */
object Sampling {

  /** Stratified sample: per-stratum Bernoulli fractions (df.stat.sampleBy).
    * Strata absent from `fractions` are dropped — the corpus-balancing
    * contract (e.g. cap every language at the same expected size).
    */
  def stratified(
      df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Balance a corpus to ~`targetPerStratum` expected rows per stratum:
    * one count pass derives the per-stratum fractions, then one Bernoulli
    * pass samples. Strata already at or under target pass through whole.
    */
  def balanced(
      df: DataFrame, stratumCol: String,
      targetPerStratum: Long, seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(stratumCol).count().collect()
      .map(r => r.get(0).toString -> r.getLong(1))
    val fractions = counts.map { case (k, n) =>
      k -> math.min(1.0, targetPerStratum.toDouble / n)
    }.toMap
    df.stat.sampleBy(stratumCol, fractions, seed)
  }
}
