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
}
