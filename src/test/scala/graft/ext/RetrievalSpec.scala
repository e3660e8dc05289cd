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

  test("bm25TopK: saturation caps tf spam; length norm penalizes padding") {
    import spark.implicits._
    // doc 1: one on-topic mention in a short doc
    // doc 2: the term repeated 20 times (tf spam) — saturated, NOT 20x doc 1
    // doc 3: one mention buried in a much longer doc — length-normalized down
    val docs = Seq(
      (1L, "spark runs fast here"),
      (2L, Seq.fill(20)("spark").mkString(" ")),
      (3L, "spark " + (1 to 40).map(i => s"pad$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, Seq("spark"), k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_fp")).toMap
    assert(out.size === 3)
    // saturation: the 20x doc scores more than 1x but far less than 20x
    assert(out(2L) > out(1L))
    assert(out(2L) < out(1L) * 4L, "tf must saturate, not scale linearly")
    // length normalization: the padded doc scores below the short doc
    assert(out(3L) < out(1L))
    // plan: still a distributed top-k
    val plan = Retrieval.bm25TopK(docs, Seq("spark"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
