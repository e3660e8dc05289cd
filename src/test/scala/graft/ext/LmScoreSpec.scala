package graft.ext

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {

  test("lmPlausibility: exact transition probabilities, repeated vs novel bigrams") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b"×2, "b a"×1
      (2L, "a b"),     // one bigram, the corpus-common one
      (3L, "a c"),     // novel continuation of "a"
      (4L, "x")        // no bigram — absent from output
    ).toDF("doc_id", "text")
    // unigram counts: a=4, b=3, c=1, x=1
    // bigram counts:  "a b"=3, "b a"=1, "a c"=1
    // p_fp("a b") = floor(3·2^20/4); p_fp("b a") = floor(1·2^20/3); p_fp("a c") = floor(2^20/4)
    val pAB = 3L * 1048576L / 4L
    val pBA = 1048576L / 3L
    val pAC = 1048576L / 4L
    val out = TextAnalysis.lmPlausibility(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("lm_fp")))).toMap
    assert(out(1L) === ((3L, (2L * pAB + pBA) / 3L)))
    assert(out(2L) === ((1L, pAB)))
    assert(out(3L) === ((1L, pAC)))
    assert(!out.contains(4L))
    // fluent doc (common transitions) outscores the novel one
    assert(out(2L)._2 > out(3L)._2)
  }
}
