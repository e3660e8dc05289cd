package graft.ext

import graft.SparkSpec

class RetrievalFusionSpec extends SparkSpec {

  test("hybridTopK: RRF arithmetic is exact and rank-sensitive, candidates only") {
    import spark.implicits._
    val docs = Seq(
      // matches 'spark' twice, decent quality
      (1L, "spark spark is a fine engine for the work. it is good."),
      // matches once, higher quality (longer, stops, sentences)
      (2L, "the spark engine is one of the good ones that we have used in the work. it is fine and good and the team likes it."),
      // no query term — must NOT appear even with perfect quality
      (3L, "the quality of this document is high but it says nothing relevant. it is long and fine and the words are the best words.")
    ).toDF("doc_id", "text")
    val out = Retrieval.hybridTopK(docs, Seq("spark"), k = 10).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L))
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1 wins lexical (tf 2 > 1), so r_lex must be 1 for doc 1
    assert(byId(1L).getAs[Long]("r_lex") === 1L)
    assert(byId(2L).getAs[Long]("r_lex") === 2L)
    // rrf is exactly the sum of the two floor quotients
    out.foreach { r =>
      val expect = 1048576L / (r.getAs[Long]("r_lex") + 60L) +
        1048576L / (r.getAs[Long]("r_qual") + 60L)
      assert(r.getAs[Long]("rrf_fp") === expect)
    }
  }
}
