package graft.ext

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  test("chunks cover the text with the configured overlap") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 40 // 1040 chars
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunking.chunk(df, "doc_id", "text", size = 500, stride = 400)
      .orderBy("chunk_idx").collect()
    // len 1040, stride 400 → idx 0,1,2 (start 0,400,800)
    assert(chunks.length === 3)
    assert(chunks.map(_.getAs[String]("chunk_text").length).toSeq === Seq(500, 500, 240))
    // overlap: chunk i's last (size-stride) chars == chunk i+1's first
    val c0 = chunks(0).getAs[String]("chunk_text")
    val c1 = chunks(1).getAs[String]("chunk_text")
    assert(c0.substring(400) === c1.substring(0, 100))
    // full coverage: stitching strides reconstructs the text
    val stitched = chunks.map(_.getAs[String]("chunk_text").take(400)).mkString
    assert(stitched.take(text.length) === text)
  }

  test("boundary cases: exact multiple, shorter than one chunk, empty") {
    import spark.implicits._
    val df = Seq(
      (1L, "x" * 800), // exact multiple of stride → starts 0, 400
      (2L, "short"),
      (3L, "")
    ).toDF("doc_id", "text")
    val byDoc = Chunking.chunk(df, "doc_id", "text", size = 500, stride = 400)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc(1L).length === 2)
    assert(byDoc(2L).length === 1 &&
      byDoc(2L).head.getAs[String]("chunk_text") === "short")
    assert(byDoc(3L).length === 1 &&
      byDoc(3L).head.getAs[String]("chunk_text") === "")
  }

  test("sentenceChunks: sentences never split, budget quantizes starts, blanks dropped") {
    import spark.implicits._
    // doc 1: sentences of 3, 4, 2 tokens; budget 5 →
    //   s1 starts at 0 → chunk 0; s2 starts at 3 → chunk 0; s3 at 7 → chunk 1
    // doc 2: no ender → one sentence, one chunk
    // doc 3: trailing/double enders produce blank pseudo-sentences → dropped
    val docs = Seq(
      (1L, "one two three. four five six seven! eight nine."),
      (2L, "just a run on sentence with no enders at all"),
      (3L, "a b c.. d e?")
    ).toDF("doc_id", "text")
    val out = Chunking.sentenceChunks(docs, budget = 5L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        ((r.getAs[Long]("n_sentences"), r.getAs[Long]("n_tokens")))).toMap
    assert(out((1L, 0L)) === ((2L, 7L)))
    assert(out((1L, 1L)) === ((1L, 2L)))
    assert(out((2L, 0L)) === ((1L, 10L)))
    // doc 3: "a b c" (3 tok) chunk 0; "d e" starts at 3 → chunk 0; total 5
    assert(out((3L, 0L)) === ((2L, 5L)))
    assert(out.keys.count(_._1 == 3L) === 1)
  }
}
