package graft.ext

import graft.SparkSpec

class SegmentDedupSpec extends SparkSpec {

  test("corpus-wide first occurrence wins; later copies drop") {
    import spark.implicits._
    val seg1 = (1 to 3).map(i => s"a$i b$i c$i").mkString(" ") // 9 words
    val boiler = (1 to 3).map(i => s"x$i y$i z$i").mkString(" ")
    // segWords=9 cuts each doc into exact 9-word segments
    val docs = Seq(
      (1L, s"$seg1 $boiler"), //       segs: [seg1, boiler] — both first
      (2L, s"$boiler $seg1"), //       both already seen → 0 kept
      (3L, s"$boiler ${seg1.toUpperCase}")) // upper seg is new
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, segWords = 9)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 2L, 2L, 0L),
      (2L, 2L, 0L, 2L),
      (3L, 2L, 1L, 1L)))
  }

  test("within-doc repeats also dedup; short docs are one segment") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r p q r"), // two identical 3-word segments → keep first
      (2L, "solo")) //        1 word < segWords → one whole-text segment
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, segWords = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 2L, 1L, 1L), (2L, 1L, 1L, 0L)))
  }
}
