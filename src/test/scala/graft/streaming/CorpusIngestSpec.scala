package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusIngestSpec extends SparkSpec {

  private def readIds(path: String): Set[Long] =
    spark.read.parquet(path).select("doc_id").collect().map(_.getLong(0)).toSet

  test("batches dedup against the accumulated corpus; signature store advances") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val (corpus, sigs) = (s"$base/corpus", s"$base/sigs")
    val t1 = "the quick brown fox jumps over the lazy dog in the morning"
    val t2 = "an entirely different second document about spark partitions and shuffles"
    val t3 = "novel third text with its own vocabulary and nothing shared at all"

    // batch 1: doc 2 duplicates doc 1 within the batch
    val b1 = Seq((1L, t1), (2L, t1)).toDF("doc_id", "text")
    val v1 = CorpusIngest.ingestBatch(b1, corpus, sigs, minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("is_dup")).toMap
    assert(v1 === Map(1L -> false, 2L -> true))
    assert(readIds(corpus) === Set(1L))
    assert(readIds(sigs) === Set(1L)) // store tracks admissions exactly

    // batch 2: doc 10 duplicates the EXISTING corpus, 11 is clean
    val b2 = Seq((10L, t1), (11L, t2)).toDF("doc_id", "text")
    val v2 = CorpusIngest.ingestBatch(b2, corpus, sigs, minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("is_dup")).toMap
    assert(v2 === Map(10L -> true, 11L -> false))
    assert(readIds(corpus) === Set(1L, 11L))

    // re-delivery of batch 2 (at-least-once): nothing new admitted
    CorpusIngest.ingestBatch(b2, corpus, sigs, minJaccard = 0.5).collect()
    assert(readIds(corpus) === Set(1L, 11L))
    assert(readIds(sigs) === Set(1L, 11L))

    // batch 3 through the STREAMING surface
    val b3 = Seq((20L, t3)).toDF("doc_id", "text")
    val src = s"$base/incoming"
    b3.write.parquet(src)
    val q = CorpusIngest.stream(
      spark.readStream.schema(b3.schema).parquet(src),
      corpus, sigs, s"$base/ckpt", minJaccard = 0.5)
    try q.processAllAvailable() finally q.stop()
    assert(readIds(corpus) === Set(1L, 11L, 20L))
  }
}
