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
}
