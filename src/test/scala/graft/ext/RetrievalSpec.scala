package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  test("postings: one row per (doc, distinct term) with exact tf") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b")).toDF("doc_id", "text")
    val p = Retrieval.postings(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(p === Map((1L, "a") -> 2L, (1L, "b") -> 1L, (2L, "b") -> 1L))
  }

  test("searchTopK: closed-form integer tf-idf ranking") {
    import spark.implicits._
    // 4 docs; "rare" in 1 doc, "common" in all 4
    val docs = Seq(
      (1L, "rare common"),
      (2L, "common common common"),
      (3L, "common other"),
      (4L, "common words here")).toDF("doc_id", "text")
    val out = Retrieval.searchTopK(docs, Seq("rare", "common"), k = 2).collect()
    // idf_milli: rare = 4000000/1 = 4000000, common = 4000000/4 = 1000000
    // doc1 = 1·4000000 + 1·1000000 = 5000000; doc2 = 3·1000000 = 3000000
    assert(out.length === 2)
    assert(out(0).getLong(0) === 1L && out(0).getAs[Long]("score_num") === 5000000L)
    assert(out(1).getLong(0) === 2L && out(1).getAs[Long]("score_num") === 3000000L)
    assert(out(0).getAs[Long]("n_terms") === 2L)
  }

  test("searchTopK: top-k compiles to TakeOrderedAndProject, never a full sort") {
    val docs = graft.Tables.documents(spark, sf0001)
    val plan = Retrieval.searchTopK(docs, Seq("spark", "join"), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort planned:\n$plan")
  }
}
