package graft.ext

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {

  test("learns the classic merge sequence on a hand-computed corpus") {
    import spark.implicits._
    // words: low×3, lower×2, newest×1
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val out = BpeTrainer.train(docs, merges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // iter1: "l o" and "o w" tie at 5 → lexical ascending picks "l o"
    // iter2: "lo w" 5; iter3: "e r" 2 beats "low e" 2 lexically; iter4: "low er" 2
    assert(out.toSeq === Seq(
      (1, "l o", 5L),
      (2, "lo w", 5L),
      (3, "e r", 2L),
      (4, "low er", 2L)))
  }

  test("repeated symbols merge leftmost-non-overlapping") {
    import spark.implicits._
    // 'aaaa' = a a a a: pair "a a" count 3; merging gives aa aa (not a aa a)
    val docs = Seq("aaaa").toDF("text")
    val out = BpeTrainer.train(docs, merges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out(0) === ((1, "a a", 3L)))
    // after merge: "aa aa" → the only pair is "aa aa" with count 1
    assert(out(1) === ((2, "aa aa", 1L)))
  }

  test("tokenCounts: learned merges shrink token counts, word boundaries respected") {
    import spark.implicits._
    val docs = Seq((1L, "low low low"), (2L, "lower newest")).toDF("doc_id", "text")
    val merges = Seq("l o", "lo w", "e r", "low er") // the learned sequence
    val out = BpeTrainer.tokenCounts(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: each "low" → 1 token; doc 2: "lower" → 1, "newest" → 6 chars
    // ("n e w e s t" has no learned merge except "e r"? no: no adjacent e r)
    assert(out(1L) === ((3L, 3L)))
    assert(out(2L) === ((7L, 2L)))
    // no merges: token count = char count
    val none = BpeTrainer.tokenCounts(docs, "text", "doc_id", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(none(1L) === 9L)
    assert(none(2L) === 11L)
  }

  test("stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq("a b c").toDF("text") // all words single-char
    val out = BpeTrainer.train(docs, merges = 3).collect()
    assert(out.isEmpty)
  }
}
