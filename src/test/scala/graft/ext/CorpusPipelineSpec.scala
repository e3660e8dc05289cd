package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {

  test("freeze: gate + dedup + split account for every row, reproducibly") {
    val docs = Tables.documents(spark, sf0001)
    val total = docs.count()
    val frozen = CorpusPipeline.freeze(docs)
    val n = frozen.count()
    assert(n > 0 && n <= total)
    // survivors keep their original columns plus the split
    assert(frozen.columns.toSet ===
      docs.columns.toSet + "split")
    // the split partitions the survivors
    assert(frozen.groupBy("split").count().collect().map(_.getLong(1)).sum === n)
    // no content duplicates survive
    val distinctTexts = frozen.select("text").distinct().count()
    assert(distinctTexts === n)
    // gate honored: every survivor passes the repetition filter
    val gated = TextAnalysis.withRepetitionMetrics(docs).filter(col("keep")).count()
    assert(n <= gated)
    // pure function of the data: identical under a different partitioning
    val again = CorpusPipeline.freeze(docs.repartition(7))
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again ===
      frozen.select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("freeze keeps the lowest-id copy of duplicated content") {
    import spark.implicits._
    val docs = Seq(
      (5L, "five words of reasonable text here", "en"),
      (3L, "five words of reasonable text here", "en"), // same content, lower id
      (7L, "a different document with enough words to pass", "en")
    ).toDF("doc_id", "text", "lang")
    val ids = CorpusPipeline.freeze(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L, 7L))
  }

  test("datasetCard: counts, dup rate, and top lang on a known corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox", "en", "web"),
      (2L, "the quick brown fox", "en", "web"),   // exact dup of 1
      (3L, "ein ganz anderer text", "de", "web"),
      (4L, "one more english document", "en", "books")
    ).toDF("doc_id", "text", "lang", "source")
    val card = CorpusPipeline.datasetCard(docs).collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(card("n_docs")._1.get === 4.0)
    assert(card("n_sources")._1.get === 2.0)
    assert(card("n_langs")._1.get === 2.0)
    assert(card("dup_docs")._1.get === 1.0)
    assert(card("exact_dup_rate")._1.get === 0.25)
    assert(card("total_tokens")._1.get === 16.0)
    assert(card("top_lang")._2.get === "en")
    assert(card("top_lang")._1.isEmpty && card("n_docs")._2.isEmpty)
    assert(card.size === 9)
  }

  test("releaseScorecard: one row, exact counts for code/mixed/dup gates") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, base),                                        // clean
      (2L, base + " nu"),                                // near-dup of 1 → removed
      (3L, "def f(x): return x + 1; if while for x"),    // code
      (4L, "the cat is on the mat. der hund und die katze sind hier.") // mixed
    ).toDF("doc_id", "text")
    val r = CorpusPipeline.releaseScorecard(docs).collect()(0)
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("n_code") === 1L)
    assert(r.getAs[Long]("n_mixed") === 1L)
    assert(r.getAs[Long]("n_dup_removed") === 1L)
    assert(r.getAs[Long]("code_share_fp") === 1048576L / 4L)
    assert(r.getAs[Long]("mixed_share_fp") === 1048576L / 4L)
    assert(r.getAs[Long]("dup_share_fp") === 1048576L / 4L)
    val meanQ = r.getAs[Long]("mean_quality_e6")
    assert(meanQ > 0L && meanQ <= 1000000L)
  }
}
